"""Sequential dynamic modeler (SURVEY M4–M6, C5–C7) — the reference's
sampling state machine ``poll → getLinks → fetch → cluster → inspect →
{refine} → update → poll… → finalize`` (``DynamicModeler.java:100-116``)
re-expressed as a driver loop.

Why driver-side: the modeling phase fetches at most ``model_pages``
pages **by design** (the budget, ``DynamicModeler.java:177``) — tens of
pages even for large sites — and its decisions are order-sensitive.
Page-level parsing still uses the same ``extract_schema`` kernel as the
distributed Arrow UDF, and fetches go through a pluggable fetcher (the
hermetic corpus here; a batched Spark join in a live deployment).

Faithful pieces:
- LC priority: singleton-cluster parents first, then density
  ``size/cluster.outgoingURLs`` (``LinkCollection.densestFirst:192-205``);
- sampling: first/middle/last valid link, ≤ max_fetches
  (``LinkCollection.getLinksToFetch:138-175``);
- decision table on (#pages, #clusters) incl. menu-refetch escalation
  (``DynamicModeler.inspect:272-310``);
- XPath refinement search (``changeXPath:354-385``) over the stored
  page HTML via the lattice (modeler/xpath.py);
- sequential MDL update + page-link recording (``update:312-330``);
- finalize: schema + link-distance collapses, graph build with
  menu→list downgrade and link-type precedence
  (``finalUpdate:425-433``, ``Page.buildLinks:253-261``).

Menu item xpaths follow the reference's Menu/MenuItem semantics
(``model/Menu.java:51-59``, ``model/MenuItem.java:80-117``): a menu is
*mutable* iff any item was reached from >=2 source pages whose href
lists are disjoint (the menu shows different links on different pages,
so hrefs can't address items) — mutable menus emit positional
``(xpath)[i]`` items; *fixed* menus (same links everywhere) emit
href-predicated ``xpath[@href="..."]`` items, byte-compatible with the
reference's saved models (``StaticModelerTest.java:113-118``).
Hand-written positional targets (``targets/localhost_target.csv``)
remain first-class through the loader (``sources/targets.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urljoin

from smart_crawler_spark.modeler.cluster import (
    MIN_DISTANCE,
    ClusterStats,
    CostModel,
    collapsed,
    distance,
    mdl_update,
)
from smart_crawler_spark.modeler.graph import links_distance
from smart_crawler_spark.modeler.schema import extract_schema, is_valid_link
from smart_crawler_spark.modeler.xpath import XPath
from smart_crawler_spark.sources.targets import NavigationModel


@dataclass
class MPage:
    url: str
    title: str
    link_schema: list[str]
    out_links: dict[str, list[str]]       # default xpath -> hrefs
    label_values: dict[str, str]
    html: str = ""
    classified: bool = False
    # (xpath, type, dst_pages, dst_hrefs) — hrefs captured at record time
    # like MenuPageLink's constructor (MenuPageLink.java:11-15)
    page_links: list = field(default_factory=list)
    href: str | None = None  # last href used to reach this page (Page.setHref)
    # resolved URL -> raw href attribute as written in the page HTML —
    # lets menu items carry the literal href (the reference's
    # Page.getHref feeds MenuItem's [@href="..."] predicates)
    href_map: dict = field(default_factory=dict)

    @property
    def urls_size(self) -> int:
        return sum(len(v) for v in self.out_links.values())

    @property
    def schema(self) -> set:
        return set(self.link_schema) | set(self.label_values)

    def to_stats(self, cid: str) -> ClusterStats:
        return ClusterStats(
            cid=cid,
            size=1,
            urls_total=self.urls_size,
            urls=[self.url],
            link_df={xp: 1 for xp in self.link_schema},
            label_counts={(xp, t): 1 for xp, t in self.label_values.items()},
        )


@dataclass
class LinkCollection:
    page: MPage
    xpath: XPath
    links: list[str]
    ltype: str | None = None  # list | menu | singleton
    refinable: bool = True
    finer: bool = False
    max_fetches: int = 3

    def links_to_fetch(self, base: str) -> list[str]:
        ls = self.links
        n = len(ls)
        if n <= self.max_fetches:
            return [h for h in ls if is_valid_link(h, base)]
        out = []
        i = 0
        middle, end = (n - 1) // 2, n - 1
        while i < n:
            if is_valid_link(ls[i], base):
                out.append(ls[i])
                break
            i += 1
        i = middle if i < middle else i + 1
        while i < n:
            if is_valid_link(ls[i], base):
                out.append(ls[i])
                break
            i += 1
        last = i
        i = end if i < end else 0
        while i > last:
            if is_valid_link(ls[i], base):
                out.append(ls[i])
                break
            i -= 1
        return out


class CorpusFetcher:
    """Hermetic fetch: url → (final_url, title, html) from the synthetic
    corpus rows (the live-deployment fetcher is a batched Spark join)."""

    def __init__(self, rows: list[dict], html_of=None):
        from smart_crawler_spark.datagen.site import page_html

        self._html_of = html_of or page_html
        self.by_url = {r["url"]: r for r in rows}

    def fetch(self, url: str):
        row = (
            self.by_url.get(url)
            or self.by_url.get(url.rstrip("/"))
            or self.by_url.get(url.rstrip("/") + "/")
        )
        if row is None:
            raise LookupError(f"404 {url}")
        if row.get("redirect_to"):
            row = self.by_url[row["redirect_to"]]
        return row["url"], row["title"], self._html_of(row)


class DynamicModeler:
    def __init__(
        self,
        fetcher: CorpusFetcher,
        site: str,
        model_pages: int = 10,
        min_distance: float = MIN_DISTANCE,
    ):
        self.fetcher = fetcher
        self.site = site.rstrip("/")
        self.model_pages = model_pages
        self.min_distance = min_distance
        self.visited: dict[str, MPage] = {}
        self.redirects: dict[str, str] = {}
        self.model: list[tuple[ClusterStats, list[MPage]]] = []
        self.fetched = 0
        self._id = 0

    # -- page / collection construction ---------------------------------
    def _make_page(self, url: str, title: str, html: str) -> MPage:
        s = extract_schema(url, html)
        return MPage(
            url=url,
            title=title,
            link_schema=s["link_schema"],
            out_links=s["out_links"],
            label_values=s["label_values"],
            html=html,
            href_map=s["href_map"],
        )

    def _collections(self, page: MPage) -> list[LinkCollection]:
        out = []
        for xp, hrefs in page.out_links.items():
            out.append(
                LinkCollection(page, _xpath_from_default(page, xp), list(hrefs))
            )
        return out

    # -- model as ClusterStats over MPages -------------------------------
    def _model_stats(self) -> list[ClusterStats]:
        return [c for c, _pages in self.model]

    def _cluster_of_page(self, page: MPage):
        for c, pages in self.model:
            if page in pages:
                return c, pages
        return None, []

    def _outgoing_urls(self, cluster_pages: list[MPage]) -> int:
        return sum(p.urls_size for p in cluster_pages) or 1

    def _priority(self, lc: LinkCollection):
        c, pages = self._cluster_of_page(lc.page)
        singleton = 0 if (c is not None and c.size == 1) else 1
        density = len(lc.links) / self._outgoing_urls(pages)
        return (singleton, -density)

    # -- the state machine ------------------------------------------------
    def run(self) -> NavigationModel:
        queue: list[LinkCollection] = []
        final_url, title, html = self.fetcher.fetch(self.site)
        self.site = final_url.rstrip("/") or final_url
        seed = self._make_page(final_url, title, html)
        self.visited[final_url] = seed
        self.redirects[self.site] = final_url
        seed.classified = True
        self._id += 1
        self.model.append((seed.to_stats(str(self._id)), [seed]))
        queue.extend(self._collections(seed))

        while queue:
            queue.sort(key=self._priority)
            collection = queue.pop(0)
            new_pages = self._fetch_collection(collection, queue)
            if not new_pages:
                continue
            # cluster -> inspect -> (refine loop) -> update
            while True:
                candidates = self._cluster(new_pages)
                action = self._inspect(collection, new_pages, candidates)
                if action == "update":
                    break
                if action == "refine":
                    if self._refine(collection):
                        new_pages = self._fetch_collection(collection, queue)
                        if not new_pages:
                            break
                        continue
                    collection.refinable = False
                    continue  # re-inspect with refinable=False
                if action == "getLinks":  # menu refetch-all escalation
                    new_pages = self._fetch_collection(collection, queue)
                    if not new_pages:
                        break
                    continue
            if new_pages:
                self._update(collection, new_pages, candidates, queue)
        return self.finalize()

    def _fetch_collection(
        self, collection: LinkCollection, queue: list
    ) -> list[MPage]:
        new_pages: list[MPage] = []
        # the parent page knows the literal href attribute behind each
        # resolved collection link (Page.getHref feeds menu predicates)
        raw_of = collection.page.href_map
        for href in collection.links_to_fetch(self.site):
            url = urljoin(self.site + "/", href)
            url = url.rstrip("/") if url.rstrip("/") != self.site else url
            raw = raw_of.get(href, href)
            known = self.visited.get(self.redirects.get(url, url))
            if known is not None:
                known.href = raw  # Page.setHref on every visit
                new_pages.append(known)
                continue
            if self.fetched >= self.model_pages:
                queue.clear()
                return new_pages
            try:
                final, title, html = self.fetcher.fetch(url)
            except LookupError:
                continue
            self.fetched += 1
            page = self.visited.get(final)
            if page is None:
                page = self._make_page(final, title, html)
                self.visited[final] = page
            self.redirects[url] = final
            page.href = raw
            new_pages.append(page)
        return new_pages

    def _cluster(self, new_pages: list[MPage]) -> list[list[MPage]]:
        """C1 group by default link schema + C2 label split + C3 collapse
        (DynamicModeler.cluster:214-241), over the new pages only."""
        groups: dict[tuple, list[MPage]] = {}
        for p in new_pages:
            groups.setdefault(tuple(sorted(p.link_schema)), []).append(p)
        candidates = list(groups.values())
        # label split
        split_off = []
        for pages in candidates:
            texts: dict[tuple, int] = {}
            for p in pages:
                for kv in p.label_values.items():
                    texts[kv] = texts.get(kv, 0) + 1
            class_labels = {xp for (xp, _t), n in texts.items() if n >= 2}
            removed = [
                p
                for p in pages
                if p.label_values and not class_labels <= set(p.label_values)
            ]
            for p in removed:
                pages.remove(p)
            if removed:
                split_off.append(removed)
        candidates = [c for c in candidates if c] + split_off
        candidates.sort(key=len, reverse=True)
        # C3 collapse below min distance (page-set jaccard on schemas)
        stats = [self._pages_stats(c) for c in candidates]
        merged = collapsed(
            stats, lambda a, b: distance(a, b) < self.min_distance
        )
        by_cid = {st.cid: c for st, c in zip(stats, candidates)}
        return [
            sum((by_cid[m] for m in st.members), []) for st in merged
        ]

    def _pages_stats(self, pages: list[MPage]) -> ClusterStats:
        # cid from the instance counter — NEVER str(id(list)): fresh
        # lists die after each round, CPython reuses their addresses,
        # and a recycled id colliding with a persisted model cid would
        # silently attach new pages to the wrong cluster
        self._id += 1
        cid = str(self._id)
        st = pages[0].to_stats(cid)
        for p in pages[1:]:
            st = st.merge(p.to_stats(cid))
        st.members = [cid]
        return st

    def _inspect(
        self, collection: LinkCollection, new_pages: list, candidates: list
    ) -> str:
        """C5 decision table (DynamicModeler.inspect:272-310)."""
        pages, clusters = len(new_pages), len(candidates)
        if pages == 3:
            if clusters == 1:
                collection.ltype = "list"
            elif clusters == 2:
                if collection.refinable:
                    collection.finer = True
                    return "refine"
                collection.ltype = "list"
            else:
                if collection.refinable:
                    collection.finer = True
                    return "refine"
                collection.ltype = "menu"
                if len(collection.links) > 3 and collection.max_fetches == 3:
                    collection.max_fetches = len(collection.links)
                    return "getLinks"
        elif pages == 2:
            collection.ltype = "list" if clusters == 1 else "menu"
        elif pages == 1:
            if collection.refinable and not collection.finer:
                return "refine"
            collection.ltype = "singleton"
        return "update"

    def _refine(self, collection: LinkCollection) -> bool:
        """C6 XPath refinement search (changeXPath:354-385)."""
        import copy

        page = collection.page
        xp = collection.xpath
        # refine() mutates xp.tags in place; the deepcopy is the restore
        original = copy.deepcopy(xp)
        while xp.refine(collection.finer):
            links = _eval_xpath_hrefs(page, xp)
            if links != collection.links and len(set(links)) < page.urls_size:
                collection.links = links
                return True
        collection.xpath = original
        return False

    def _update(self, collection, new_pages, candidates, queue) -> None:
        """C4 MDL merge + C7 page-link recording (update:312-330)."""
        fresh = [[p for p in c if not p.classified] for c in candidates]
        fresh = [c for c in fresh if c]
        if fresh:
            idf = _global_idf(self.visited.values())
            cost = CostModel(idf)
            model_stats = {st.cid: (st, pages) for st, pages in self.model}
            fresh_stats = [self._pages_stats(c) for c in fresh]
            by_mid = {st.cid: c for st, c in zip(fresh_stats, fresh)}
            merged = mdl_update(
                [st for st, _p in self.model], fresh_stats, cost
            )
            new_model = []
            for st in merged:
                pages: list[MPage] = []
                for m in st.members:
                    if m in model_stats:
                        pages.extend(model_stats[m][1])
                    elif m in by_mid:
                        pages.extend(by_mid[m])
                st.members = [st.cid]
                new_model.append((st, pages))
            self.model = new_model
        # page links from parent to the sampled pages; hrefs captured NOW
        # (MenuPageLink's constructor snapshot of p.getHref())
        collection.page.page_links.append(
            (
                collection.xpath.get(),
                collection.ltype or "singleton",
                new_pages,
                [p.href for p in new_pages],
            )
        )
        for p in new_pages:
            if not p.classified:
                p.classified = True
                queue.extend(self._collections(p))

    # -- finalize ---------------------------------------------------------
    def finalize(self) -> NavigationModel:
        """C8 collapses + C9-C11 graph (finalizeModel/finalUpdate:425-433):
        first collapse classes by schema distance, then build the graph
        once and collapse by ClassLink-set distance, then rebuild."""
        stats = []
        pagemap = {}
        for st, pages in self.model:
            stats.append(st)
            pagemap[st.cid] = pages
        merged = collapsed(stats, lambda a, b: distance(a, b) < self.min_distance)
        clusters = []
        for st in merged:
            pages = []
            for m in st.members:
                pages.extend(pagemap.get(m, []))
            clusters.append((st, pages))
        clusters = _collapse_by_links(
            clusters, self.redirects, self.site, self.min_distance
        )
        # exposed for golden evaluation (C12): final page→cluster map
        self.final_clusters = clusters
        return _to_graph(clusters, self.visited, self.redirects, self.site)


# -- helpers ----------------------------------------------------------------


def _xpath_from_default(page: MPage, default: str) -> XPath:
    """Rebuild a refinable XPath object for a default path by locating a
    matching anchor chain in the page HTML."""
    from smart_crawler_spark.modeler.schema import _chain, _TreeBuilder

    tb = _TreeBuilder()
    tb.feed(page.html)
    for a in tb.anchors:
        xp = XPath(_chain(a))
        if xp.default == default:
            return xp
    # fallback: opaque, unrefinable
    xp = XPath([("a", [])])
    xp.tags = []
    return xp


def _eval_xpath_hrefs(page: MPage, xp: XPath) -> list[str]:
    """Evaluate a refined xpath version against the page's anchors by
    structural match of the lattice state. Hrefs are resolved + filtered
    EXACTLY like extract_schema's out_links — the refine loop compares
    these lists against collection.links, and a representation mismatch
    (raw vs resolved) would read as 'links changed' and accept a bogus
    coarsening (caught on the reference fixture site, whose anchors are
    relative while the synthetic corpus' are absolute)."""
    from smart_crawler_spark.modeler.schema import _chain, _TreeBuilder

    tb = _TreeBuilder()
    tb.feed(page.html)
    want = xp.get()
    out = []
    for a in tb.anchors:
        cand = XPath(_chain(a))
        if _matches(cand, want):
            resolved = is_valid_link(dict(a.attrs).get("href"), page.url)
            if resolved:
                out.append(resolved)
    return out


def _matches(cand: XPath, want: str) -> bool:
    """True if the anchor (via its finest path) satisfies the xpath
    string ``want`` — delegates to the shared structural matcher
    (modeler/schema.py:xpath_struct_match)."""
    from smart_crawler_spark.modeler.schema import xpath_struct_match

    return xpath_struct_match(want, cand.finest())


def _global_idf(pages) -> dict[str, float]:
    import math

    pages = list(pages)
    n = len(pages)
    df: dict[str, int] = {}
    for p in pages:
        for xp in p.schema:
            df[xp] = df.get(xp, 0) + 1
    return {xp: math.log(n / d) for xp, d in df.items()}


def _collapse_by_links(clusters, redirects, site, min_distance):
    """C8 phase 2 — the link-distance collapse of ``finalUpdate``
    (``DynamicModeler.java:430-432``): build the class graph once, then
    run the reference's pairwise pass (i ascending, j descending,
    ``collapsed:224-241``) merging class pairs whose ClassLink-set
    distance (``ModelCostCalculator.distanceLinks:177-186``) is below
    ``min_distance``.

    A class's link set is its outgoing ClassLinks — menus expanded to
    per-item links (``PageClass.getAllLinks:169-173``,
    ``Menu.toClassLinks:100-108``) — plus the root hierarchy's inbound
    view (``PageClass.getLinksFor:175-179``: every edge in the graph
    whose destination is this class). ClassLink identity is the exact
    ``(xpath, type)`` pair: the reference stores links in HashSets whose
    lookups hash exactly those two fields (``ClassLink.java:86-88``),
    so that is the equality its set algebra actually executes.

    Distances use the PRE-pass graph throughout: the reference's
    ``model2Class`` map is built by ``toGraph`` before the pass and not
    rebuilt when classes merge mid-pass
    (``WebsiteModel.getPageClass:84-86``)."""
    if len(clusters) <= 1:
        return clusters
    _page2cid, _names, edges, _root_cid = _graph_edges(clusters, redirects, site)
    linksets: dict[int, set] = {i: set() for i in range(len(clusters))}
    for (src, xpath, dst), e in edges.items():
        linksets[src].add((xpath, e["t"]))
        linksets[dst].add((xpath, e["t"]))
    items: list = list(clusters)
    for i in range(len(items)):
        for j in range(len(items) - 1, i, -1):
            if items[i] is None or items[j] is None:
                continue
            d = links_distance(linksets[i], linksets[j])
            if d < min_distance:  # NaN (two link-less classes) → False
                si, pi = items[i]
                sj, pj = items[j]
                items[i] = (si.merge(sj), pi + pj)
                items[j] = None
    return [c for c in items if c is not None]


def _to_graph(clusters, visited, redirects, site) -> NavigationModel:
    """C9-C11: assemble the NavigationModel from the shared edge
    construction (``_graph_edges``)."""
    _page2cid, names, edges, root_cid = _graph_edges(clusters, redirects, site)
    model = NavigationModel(root=names[root_cid])
    for (src, xpath, dc), e in sorted(
        edges.items(), key=lambda kv: (kv[0][0], kv[0][1], kv[0][2])
    ):
        model.class_links.append(
            {
                "src_class": names[src],
                "xpath": xpath,
                "dst_class": names[dc],
                "link_type": e["t"],
                "anchor_text": None,
                "menu_href": None,
                "menu_type": e["mt"],
            }
        )
    model.assign_depths()
    return model


def _graph_edges(clusters, redirects, site):
    """Replay page links into typed class edges with the reference
    precedence (list > menu > singleton on conflicts, Page.buildLinks
    menu→list downgrade) and Menu/MenuItem typing: fixed menus emit
    href-predicated items, mutable menus positional index blocks
    (Menu.setType + MenuItem.useIndexes/getXpath, Menu.java:51-59,
    MenuItem.java:80-117). Returns ``(page2cid, names, edges,
    root_cid)`` where ``edges`` maps ``(src_cid, xpath, dst_cid)`` to
    ``{"t": link_type, "mt": menu_type}`` — shared by the model
    assembly (``_to_graph``) and the C8 link-distance collapse."""
    page2cid = {}
    names = {}
    for i, (st, pages) in enumerate(clusters):
        titles = sorted({p.title for p in pages})[:3]
        names[i] = f"{i}_" + ",".join(titles)
        for p in pages:
            page2cid[p.url] = i

    # type precedence per (src, base xpath): list > menu > singleton
    # (ListPageLink/MenuPageLink/SinglePageLink override rules)
    _PREC = {"list": 2, "menu": 1, "singleton": 0}
    type_by_key: dict[tuple, str] = {}
    raw: list[tuple] = []  # (src, base_xpath, ltype, dst_cids, src_url, hrefs)
    for i, (st, pages) in enumerate(clusters):
        for p in pages:
            for xpath, ltype, dsts, hrefs in p.page_links:
                pairs = [
                    (page2cid[d.url], h)
                    for d, h in zip(dsts, hrefs)
                    if d.url in page2cid
                ]
                if not pairs:
                    continue
                dst_cids = [dc for dc, _ in pairs]
                if ltype == "menu" and len(set(dst_cids)) == 1:
                    ltype = "list"  # Page.buildLinks:253-261 downgrade
                key = (i, xpath)
                if key not in type_by_key or _PREC[ltype] > _PREC[type_by_key[key]]:
                    type_by_key[key] = ltype
                raw.append((i, xpath, ltype, pairs, p.url))

    edges: dict[tuple, dict] = {}
    # menus accumulate Menu/MenuItem state: item (= destination class)
    # -> {source page url -> [hrefs]}, insertion-ordered like Menu.items
    menus: dict[tuple, dict] = {}
    for i, xpath, ltype, pairs, src_url in raw:
        winner = type_by_key[(i, xpath)]
        if ltype != winner:
            continue
        if winner == "menu":
            items = menus.setdefault((i, xpath), {})
            for dc, href in pairs:
                items.setdefault(dc, {}).setdefault(src_url, []).append(
                    href if href is not None else ""
                )
        else:
            for dc in {dc for dc, _ in pairs}:
                edges.setdefault((i, xpath, dc), {"t": winner, "mt": None})

    for (i, xpath), items in menus.items():
        # MenuItem.isMutable: >=2 source pages whose href lists are
        # disjoint (checked on the first two, source-url order pinned
        # for determinism); Menu.setType: any mutable item => mutable
        def _item_mutable(pages: dict) -> bool:
            if len(pages) <= 1:
                return False
            first, second = sorted(pages)[:2]
            return not (set(pages[first]) & set(pages[second]))

        if any(_item_mutable(pg) for pg in items.values()):
            # MenuItem.useIndexes: consecutive positional blocks across
            # items in insertion order, sized by the first page's list
            idx = 1
            for dc, pages in items.items():
                for _ in pages[sorted(pages)[0]]:
                    edges.setdefault(
                        (i, f"({xpath})[{idx}]", dc),
                        {"t": "menu", "mt": "mutable"},
                    )
                    idx += 1
        else:
            # fixed: one href-predicated item per distinct href
            for dc, pages in items.items():
                seen_h: set = set()
                for src in sorted(pages):
                    for h in pages[src]:
                        if h in seen_h:
                            continue
                        seen_h.add(h)
                        edges.setdefault(
                            (i, f'{xpath}[@href="{h}"]', dc),
                            {"t": "menu", "mt": "fixed"},
                        )

    # first non-None lookup wins — cluster id 0 is falsy, so `or`
    # chaining would skip a root legitimately clustered into cluster 0
    root_cid = next(
        (
            cid
            for cid in (
                page2cid.get(redirects.get(site, site)),
                page2cid.get(site),
                page2cid.get(site + "/"),
            )
            if cid is not None
        ),
        0,
    )
    return page2cid, names, edges, root_cid
