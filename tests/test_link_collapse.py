"""C8 phase 2 — the link-distance final collapse
(``DynamicModeler.finalUpdate:430-432`` via
``ModelCostCalculator.distanceLinks:177-186``): classes whose schemas
stay apart (distance >= 0.2) but whose ClassLink sets — outgoing plus
the root hierarchy's inbound view (``PageClass.getLinksFor:175-179``) —
coincide must merge in ``DynamicModeler.finalize``."""

from smart_crawler_spark.modeler.dynamic import (
    CorpusFetcher,
    DynamicModeler,
    MPage,
    _collapse_by_links,
)
from smart_crawler_spark.modeler.graph import links_distance
from smart_crawler_spark.modeler.cluster import distance


def _mk(url, title, link_schema=(), labels=()):
    return MPage(
        url=url,
        title=title,
        link_schema=list(link_schema),
        out_links={},
        label_values=dict(labels),
    )


def test_links_distance_empty_sets_never_merge():
    """Java 0/0.0 = NaN; NaN < MIN_DISTANCE is false — two link-less
    classes are not collapsed (ModelCostCalculator.unionSize:195-197)."""
    d = links_distance(set(), set())
    assert not (d < 0.2) and d != d  # NaN


def test_collapse_by_links_merges_identical_linksets():
    """Hand-built model: root --list--> {A, B} --list--> I --singleton-->
    root. A and B have disjoint label schemas (schema distance 0.8 —
    survives the schema collapse) but identical ClassLink sets — inbound
    (root's category list) plus outgoing (the item list) — so only the
    link pass merges them; root and I have distinct sets and stay."""
    root = _mk("http://s/", "Home", ["//ul/li/a"])
    a = _mk("http://s/a", "A", ["//div/p/a"], [("//h2/text()", "x")])
    b = _mk("http://s/b", "B", ["//div/p/a"], [("//em/text()", "y")])
    i1 = _mk("http://s/i1", "I", ["//p/a"])
    i2 = _mk("http://s/i2", "I", ["//p/a"])
    root.page_links.append(("//ul/li/a", "list", [a, b], ["/a", "/b"]))
    a.page_links.append(("//div/p/a", "list", [i1], ["/i1"]))
    b.page_links.append(("//div/p/a", "list", [i2], ["/i2"]))
    i1.page_links.append(("//p/a", "singleton", [root], ["/"]))
    clusters = [
        (root.to_stats("R"), [root]),
        (a.to_stats("A"), [a]),
        (b.to_stats("B"), [b]),
        (i1.to_stats("I"), [i1, i2]),
    ]
    # precondition: the schema collapse alone would NOT merge A and B
    assert distance(clusters[1][0], clusters[2][0]) >= 0.2
    out = _collapse_by_links(clusters, {}, "http://s/", 0.2)
    assert len(out) == 3
    merged_pages = {p.url for st, ps in out for p in ps if len(ps) == 2 and ps[0].title in "AB"}
    assert merged_pages == {"http://s/a", "http://s/b"}


def test_collapse_by_links_keeps_distinct_linksets():
    """A chain R --list--> A --singleton--> I: all three ClassLink sets
    differ pairwise (distance >= 0.5) → nothing merges."""
    root = _mk("http://s/", "Home", ["//ul/li/a"])
    a = _mk("http://s/a", "A", ["//p/a"])
    i1 = _mk("http://s/i1", "I", [])
    root.page_links.append(("//ul/li/a", "list", [a], ["/a"]))
    a.page_links.append(("//p/a", "singleton", [i1], ["/i1"]))
    clusters = [
        (root.to_stats("R"), [root]),
        (a.to_stats("A"), [a]),
        (i1.to_stats("I"), [i1]),
    ]
    out = _collapse_by_links(clusters, {}, "http://s/", 0.2)
    assert len(out) == 3


# ---------------------------------------------------------------------------
# End-to-end: a fixture site where two category flavors form distinct
# clusters (each carries a flavor-specific dead link → disjoint link
# schemas) yet have identical graph link sets — inbound (home's category
# list) and outgoing (the item list) — so ONLY the C8 link pass merges
# them, like the reference's dir/dirnext-style link-driven merges.

SITE = "http://linkfix.test"
CATS_XP = "/html/body/ul[@class]/li/a"
ITEMS_XP = "/html/body/div[@class]/p/a"
BACK_XP = "/html/body/p[@class]/a"


def _home_html():
    links = "".join(
        f'<li><a href="/cat-{f}-{i}">cat {f}{i}</a></li>'
        for f in ("a", "b")
        for i in range(3)
    )
    return f"<html><body><ul class='cats'>{links}</ul></body></html>"


def _cat_html(flavor, i):
    items = "".join(
        f'<p><a href="/item-{flavor}-{i}-{j}">item {j}</a></p>'
        for j in range(3)
    )
    # flavor-specific dead links with DIFFERENT default xpaths (the
    # dialect keeps tags + attr names, not values — so the structures
    # must differ): the targets 404, so no edge ever forms and the two
    # flavors' ClassLink sets stay identical while their schemas differ
    dead = (
        "<nav><a href='/missing-a'>promo</a></nav>"
        if flavor == "a"
        else "<span class='xb'><a href='/missing-b'>promo</a></span>"
    )
    return (
        f"<html><body>{dead}<div class='items'>{items}</div></body></html>"
    )


def _item_html():
    return "<html><body><p class='back'><a href='/'>home</a></p></body></html>"


def _rows():
    rows = [{"url": f"{SITE}/", "title": "Home", "html": _home_html()}]
    for f in ("a", "b"):
        for i in range(3):
            rows.append(
                {
                    "url": f"{SITE}/cat-{f}-{i}",
                    "title": f"Cat {f}{i}",
                    "html": _cat_html(f, i),
                }
            )
            for j in range(3):
                rows.append(
                    {
                        "url": f"{SITE}/item-{f}-{i}-{j}",
                        "title": f"Item {f}{i}{j}",
                        "html": _item_html(),
                    }
                )
    return rows


def test_link_only_merge_end_to_end():
    fetcher = CorpusFetcher(_rows(), html_of=lambda r: r["html"])
    dm = DynamicModeler(fetcher, SITE + "/", model_pages=30)
    model = dm.run()

    # precondition: the sampled flavors ended the sampling phase in
    # SEPARATE clusters (disjoint dead-link schemas, distance >= 0.2),
    # so the merge below can only come from the C8 link pass
    pre = [
        {p.url for p in ps}
        for _st, ps in dm.model
        if any("/cat-" in p.url for p in ps)
    ]
    assert len(pre) == 2
    assert {u.split("-")[1] for us in pre for u in us} == {"a", "b"}
    a_st = [st for st, ps in dm.model if any("/cat-a" in p.url for p in ps)][0]
    b_st = [st for st, ps in dm.model if any("/cat-b" in p.url for p in ps)][0]
    assert distance(a_st, b_st) >= 0.2

    # the two category flavors sampled from home landed in ONE class:
    # every (home, CATS_XP) edge points at the same destination
    cat_edges = [
        e
        for e in model.class_links
        if e["src_class"] == model.root and CATS_XP in e["xpath"]
    ]
    assert cat_edges
    assert len({e["dst_class"] for e in cat_edges}) == 1
    cat_class = cat_edges[0]["dst_class"]

    # the merged class contains pages of BOTH flavors
    merged = [
        ps
        for st, ps in dm.final_clusters
        if {p.url for p in ps} & {f"{SITE}/cat-a-0"}
    ][0]
    flavors = {p.url.split("-")[1] for p in merged if "/cat-" in p.url}
    assert flavors == {"a", "b"}

    # item pages stay a separate class at depth 2
    item_edges = [
        e
        for e in model.class_links
        if e["src_class"] == cat_class and ITEMS_XP in e["xpath"]
    ]
    assert item_edges and all(e["link_type"] == "list" for e in item_edges)
    assert model.depths[item_edges[0]["dst_class"]] == 2
