"""Pure-Python oracle of the reference crawl semantics.

This module re-implements, WITHOUT Spark, exactly what the reference does
per site (one ``CrawlFrontier``+``CrawlQueue`` per seed):

- best-first dequeue: TreeSet ordered by (class depth, class name, url,
  form_params nulls-first) — ``model/CrawlURL.java:101-110``,
  ``model/PageClass.java:462-468``;
- enqueue-time dedup on the relative URL (``CrawlQueue.java:81-87``),
  with the reference's relative-URL quirks (``CrawlURL.java:86-99``);
- fetch with bounded retries: a URL is attempted up to ``max_tries``
  times, succeeding iff its synthetic ``fetch_fail_n < max_tries``
  (``actors/CrawlFetcher.java:82-117``);
- redirect adoption: content + record come from the redirect target, the
  target's relative URL joins the seen set (``CrawlPage.java:55,140-141``);
- per-class link extraction + pre-classification via the navigation
  model (``CrawlExtractor.java:97-117``), in model-file xpath order;
- data-record extraction in data-link order (``PageClass.java:226-234``);
- global page budget ``max_pages`` per seed, counted per DISPATCH
  (``pageCount`` increments in ``sendURL`` before the fetch outcome is
  known, ``CrawlFrontier.java:132-139,148-158``) — failed fetches
  consume budget too.

The Spark engine's exact-match tests compare per-host crawl order, the
final seen set, and all extracted records against this oracle.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlsplit

_HREF_XP_RE = re.compile(r'^(.*)\[@href="(.*)"\]$')
_POS_XP_RE = re.compile(r"^\((.*)\)\[\d+\]$")

from smart_crawler_spark.sources.targets import NavigationModel


def relative_url(url: str, form_params: str | None = None) -> str:
    s = urlsplit(url)
    path, query = s.path, (s.query if s.query else None)
    fp = "" if not form_params else ">" + form_params
    if path == "/" or (path == "" and query is None):
        return fp
    if query is None:
        return path + fp
    return path + query + fp


def seen_key(url: str, form_params: str | None = None) -> str:
    return (urlsplit(url).netloc.lower()) + "|" + relative_url(url, form_params)


@dataclass(order=True)
class _Entry:
    class_depth: int
    class_name: str
    url: str
    form_params: str  # "" encodes null (sorts first, like the reference)


@dataclass
class OracleResult:
    order: list[dict] = field(default_factory=list)   # seq,url,page_class,fetched
    seen: set[str] = field(default_factory=set)        # canonical seen keys
    records: list[dict] = field(default_factory=list)  # url,page_class,fields
    frontier_left: int = 0
    # round metadata (crawl_site_recrawl only): round, batch, expired
    rounds: list[dict] = field(default_factory=list)


class _SiteCrawl:
    """Shared sequential core: enqueue-time seen dedup + the per-dispatch
    fetch/extract body. ``crawl_site`` drives it as one flat best-first
    loop (the reference's shape); ``crawl_site_recrawl`` drives it in
    engine-shaped rounds with expiry."""

    def __init__(
        self,
        pages: dict[str, dict],
        model: NavigationModel,
        max_tries: int,
        frontier_heap: int | None = None,
    ):
        from smart_crawler_spark.frontier.spill import (
            UNBOUNDED,
            BoundedFrontierQueue,
        )

        self.pages = pages
        self.model = model
        self.max_tries = max_tries
        self.res = OracleResult()
        self.queue = BoundedFrontierQueue(frontier_heap or UNBOUNDED)
        self.seq = 0
        self.links_by_class: dict[str, list[dict]] = {}
        for e in model.class_links:
            self.links_by_class.setdefault(e["src_class"], []).append(e)
        self.data_by_class: dict[str, list[dict]] = {}
        for d in model.data_links:
            self.data_by_class.setdefault(d["src_class"], []).append(d)

    def enqueue(self, url: str, cls: str) -> None:
        # unknown class -> dropped BEFORE the visited set, like
        # CrawlQueue.add(String,String) returning early on a null class
        depth = self.model.depths.get(cls)
        if depth is None:
            return
        # form links arrive as "url>k=v;..." (CrawlURLFactory.java:33-44)
        form_params = None
        if ">" in url:
            url, form_params = url.split(">", 1)
        key = seen_key(url, form_params)
        if key in self.res.seen:
            return
        self.res.seen.add(key)
        self.queue.add(_Entry(depth, cls, url, form_params or ""))

    def dispatch(self, e: _Entry):
        """Fetch + extract one entry. Returns ``(ok, page)`` where
        ``page`` is the ADOPTED page dict (redirect target's content)
        on success, None on failure — crawl_site ignores the return;
        crawl_site_prioritized reads it to build the visit history."""
        pages, res = self.pages, self.res
        self.seq += 1
        # form fetches POST their params; a corpus with the POST-response
        # row keyed "url>params" answers per-params (CrawlPage.fetchUrl:
        # 135-141), else the GET page stands in for every param set
        page = pages.get(e.url + ">" + e.form_params) if e.form_params else None
        if page is None:
            page = pages.get(e.url)
        ok = page is not None and page.get("fetch_fail_n", 0) < self.max_tries
        res.order.append(
            {
                "seq": self.seq,
                "url": e.url,
                "page_class": e.class_name,
                "fetched": ok,
            }
        )
        if not ok:
            return False, None
        if page.get("redirect_to"):
            final = page["redirect_to"]
            res.seen.add(seen_key(final))
            page = pages.get(final, page)
        else:
            final = e.url
        out = page.get("out_links", {})
        for edge in self.links_by_class.get(e.class_name, []):
            hrefs = out.get(edge["xpath"])
            if hrefs is None and edge.get("link_type") == "menu":
                # href-predicated menu items (MenuItem.getXpath) classify
                # by (base xpath, href value) — the mirror of the Spark
                # engine's by_href join (crawler/extract.py) for corpora
                # that key out_links by the base xpath only
                m = _HREF_XP_RE.fullmatch(edge["xpath"])
                if m:
                    base, href = m.groups()
                    cand = list(out.get(base, []))
                    for k, v in out.items():
                        # positional corpus keys "(base)[i]" share the
                        # base (the engine strips them the same way)
                        pm = _POS_XP_RE.fullmatch(k)
                        if pm and pm.group(1) == base:
                            cand.extend(v)
                    hrefs = [h for h in cand if h == href]
            for href in hrefs or []:
                self.enqueue(href, edge["dst_class"])
        dls = self.data_by_class.get(e.class_name)
        if dls:
            vals = page.get("data_values", {})
            res.records.append(
                {
                    "url": final,
                    "page_class": e.class_name,
                    "fields": [vals.get(d["xpath"], "") for d in dls],
                }
            )
        return True, page


def crawl_site(
    pages: dict[str, dict],
    model: NavigationModel,
    seed_url: str,
    max_pages: int = 1 << 30,
    max_tries: int = 1,
    frontier_heap: int | None = None,
) -> OracleResult:
    """Crawl one site exactly as the reference frontier would.

    ``frontier_heap`` models the reference's in-memory cap
    (``frontierheap``, default 10k): when the frontier outgrows it, the
    dequeue order degrades toward FIFO across spill batches
    (``CrawlQueue.java:138-204`` via frontier/spill.py). Default None =
    unbounded (never spills — the order the Spark engine matches)."""
    c = _SiteCrawl(pages, model, max_tries, frontier_heap)
    c.enqueue(seed_url, model.root)
    # budget counts dispatches (reference pageCount++ in sendURL), so a
    # failed fetch still consumes it
    while len(c.queue) and c.seq < max_pages:
        c.dispatch(c.queue.next())
    c.res.frontier_left = len(c.queue)
    return c.res


def crawl_site_recrawl(
    pages: dict[str, dict],
    model: NavigationModel,
    seed_url: str,
    budget: int,
    recrawl_after_rounds: int,
    max_rounds: int,
    max_tries: int = 1,
) -> OracleResult:
    """Round-based recrawl-expiry mirror of the Spark engine
    (EngineConfig.recrawl_after_rounds / max_rounds): each round
    dispatches up to ``budget`` entries in best-first order (links
    enqueue as they are discovered, enqueue-time seen dedup); at round
    END, every entry dispatched in rounds <= r - N expires — it leaves
    the seen set (the engine's exact-table removal + cuckoo fingerprint
    delete) and is immediately re-enqueued with its original class,
    re-entering seen. Fetch-time (redirect-target) seen entries carry no
    dispatch round and never expire, matching the engine. The engine's
    per-round dispatch MULTISET, final seen set, and per-round expiry
    counts must equal this oracle's."""
    c = _SiteCrawl(pages, model, max_tries)
    c.enqueue(seed_url, model.root)
    # pool: seen-key -> (dispatch_round, entry); insertion order is
    # deterministic, and expiry re-enqueues via the comparator-ordered
    # queue so iteration order never matters
    pool: dict[str, tuple[int, _Entry]] = {}
    rnd = 0
    rounds_meta: list[dict] = []
    while len(c.queue) and rnd < max_rounds:
        rnd += 1
        batch = [c.queue.next() for _ in range(min(budget, len(c.queue)))]
        for e in batch:
            c.dispatch(e)
            pool[seen_key(e.url, e.form_params or None)] = (rnd, e)
        expired = [
            k for k, (d, _) in pool.items()
            if d <= rnd - recrawl_after_rounds
        ]
        for k in expired:
            _, e = pool.pop(k)
            c.res.seen.discard(k)
            url = e.url + (">" + e.form_params if e.form_params else "")
            c.enqueue(url, e.class_name)
        rounds_meta.append(
            {"round": rnd, "batch": len(batch), "expired": len(expired)}
        )
    c.res.frontier_left = len(c.queue)
    c.res.rounds = rounds_meta
    return c.res


def crawl_site_prioritized(
    pages: dict[str, dict],
    model: NavigationModel,
    seeds: list[str],
    budget: int,
    recrawl_after_rounds: int,
    max_rounds: int,
    host_trust: dict[str, float] | None = None,
    max_tries: int = 1,
) -> OracleResult:
    """Sequential mirror of the engine's PRIORITY MODE
    (EngineConfig.priority_mode + CrawlEngine(host_trust=...),
    frontier/priority.py semantics contract):

    - each round SELECTS, per host h, the top
      ``max(1, floor(budget * trust_h))`` queued entries under
      (staleness DESC, reference comparator) — trust defaults to 1.0
      for hosts absent from ``host_trust``;
    - the selected batch DISPATCHES in the reference comparator order
      (within-round bookkeeping parity — links enqueue as discovered,
      enqueue-time seen dedup, exactly like crawl_site_recrawl);
    - every successful fetch updates the per-URL visit history: the
      content fingerprint is md5(adopted-title | round // change_every)
      with ``change_every`` read from the DISPATCHED corpus row (0 or
      absent = static content);
    - at round end, entries dispatched in rounds <= r - N expire: they
      leave the seen set and re-enqueue carrying the Poisson staleness
      round(1 - exp(-(changes/span) * age), 6) from their history
      (span = last - first fetch round, age = r - last; 0.0 when a
      single visit or no successful fetch) — fresh links and seeds
      carry 0.0.

    The engine's per-round dispatch multiset, per-host dispatch order,
    final seen set, record multiset, and expiry counts must equal this
    oracle's. Multi-host seed lists share one frontier and one seen set
    (the engine's shape)."""
    import hashlib
    import math

    trust = host_trust or {}
    c = _SiteCrawl(pages, model, max_tries)
    # staleness-bearing queue: (staleness, entry) pairs; _SiteCrawl's
    # enqueue() path (fresh links, seed bootstrap) lands at 0.0
    items: list[tuple[float, _Entry]] = []

    class _StaleQueue:
        def add(self, e: _Entry) -> None:
            items.append((0.0, e))

        def __len__(self) -> int:
            return len(items)

    c.queue = _StaleQueue()
    for seed in seeds:
        c.enqueue(seed, model.root)

    def fp_of(e: _Entry, page: dict) -> str:
        ce = int(pages.get(e.url, {}).get("change_every") or 0)
        version = (rnd // ce) if ce > 0 else 0
        title = page.get("title") or ""
        return hashlib.md5(f"{title}|{version}".encode()).hexdigest()

    stats: dict[tuple, dict] = {}
    pool: dict[str, tuple[int, _Entry]] = {}
    rnd = 0
    rounds_meta: list[dict] = []
    while items and rnd < max_rounds:
        rnd += 1
        by_host: dict[str, list[tuple[float, _Entry]]] = {}
        for it in items:
            by_host.setdefault(urlsplit(it[1].url).netloc.lower(), []).append(it)
        batch: list[tuple[float, _Entry]] = []
        for host, hitems in by_host.items():
            # min(budget, ...): trust is a demotion signal in [0, 1] —
            # the engine filters rank <= budget BEFORE the trust join,
            # so trust > 1 can never raise a host above the base budget
            b_h = min(budget, max(1, int(budget * trust.get(host, 1.0))))
            hitems.sort(key=lambda it: (-it[0], it[1]))
            batch.extend(hitems[:b_h])
        picked = {id(it) for it in batch}
        items = [it for it in items if id(it) not in picked]
        # dispatch in the reference comparator order (bookkeeping parity)
        for _s, e in sorted(batch, key=lambda it: it[1]):
            ok, page = c.dispatch(e)
            if ok:
                k = (e.url, e.class_name, e.form_params)
                fp = fp_of(e, page)
                st = stats.setdefault(
                    k,
                    {"visits": 0, "changes": 0, "first": rnd, "fp": None},
                )
                st["visits"] += 1
                if st["fp"] is not None and st["fp"] != fp:
                    st["changes"] += 1
                st["fp"] = fp
                st["last"] = rnd
            pool[seen_key(e.url, e.form_params or None)] = (rnd, e)
        expired = [
            k for k, (d, _) in pool.items()
            if d <= rnd - recrawl_after_rounds
        ]
        for k in expired:
            _, e = pool.pop(k)
            c.res.seen.discard(k)
            st = stats.get((e.url, e.class_name, e.form_params))
            if st is not None:
                span = st["last"] - st["first"]
                lam = st["changes"] / span if span > 0 else 0.0
                age = rnd - st["last"]
                s_val = round(1.0 - math.exp(-lam * age), 6)
            else:
                s_val = 0.0
            # enqueue() with a staleness stamp: same seen gate, same
            # class lookup, but the queue entry carries s_val
            key2 = seen_key(e.url, e.form_params or None)
            if key2 not in c.res.seen:
                c.res.seen.add(key2)
                items.append(
                    (s_val, _Entry(e.class_depth, e.class_name, e.url,
                                   e.form_params))
                )
        rounds_meta.append(
            {"round": rnd, "batch": len(batch), "expired": len(expired)}
        )
    c.res.frontier_left = len(items)
    c.res.rounds = rounds_meta
    return c.res


def crawl_all(
    pages_rows: list[dict],
    model: NavigationModel,
    seeds: list[str],
    max_pages: int = 1 << 30,
    max_tries: int = 1,
) -> dict[str, OracleResult]:
    """One independent frontier per seed, like the reference controller.

    Keyed by the seed's host: two seeds sharing a host would silently
    overwrite each other's result, so that input is rejected."""
    by_url = {r["url"]: r for r in pages_rows}
    out: dict[str, OracleResult] = {}
    for seed in seeds:
        host = urlsplit(seed).netloc.lower()
        if host in out:
            raise ValueError(
                f"two seeds share host {host!r}; crawl_all results are "
                "keyed by host — run crawl_site per seed instead"
            )
        out[host] = crawl_site(by_url, model, seed, max_pages, max_tries)
    return out
