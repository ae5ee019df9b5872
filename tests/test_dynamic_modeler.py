"""Sequential dynamic modeler on the synthetic fixture site — the
assertions mirror DynamicModelerTest.java:38-60: inferred home menu with
indexed xpaths, dir class with a list link + NEXT self-singleton,
detail class at depth 2, correct budget behavior."""

import pytest

from smart_crawler_spark.datagen.site import (
    LIST_XP,
    MENU_XP,
    NEXT_XP,
    SiteConfig,
    all_rows,
)
from smart_crawler_spark.modeler.dynamic import CorpusFetcher, DynamicModeler

CFG = SiteConfig(n_hosts=1, dirs=3, chain=2, details_per_page=3, n_images=10,
                 chain_first_dir_only=True, next_cycles=True)


@pytest.fixture(scope="module")
def nav():
    fetcher = CorpusFetcher(all_rows(CFG))
    dm = DynamicModeler(fetcher, f"http://{CFG.host(0)}/", model_pages=40)
    model = dm.run()
    return dm, model


def test_root_and_depths(nav):
    dm, model = nav
    assert model.depths[model.root] == 0
    assert max(model.depths.values()) == 2


def test_home_menu_href_predicated(nav):
    """The home menu shows the same links on its one source page ⇒
    FIXED ⇒ href-predicated items (MenuItem.getXpath hrefXPath form,
    the shape StaticModelerTest.java:113-118 pins for saved models)."""
    _dm, model = nav
    home_edges = [e for e in model.class_links if e["src_class"] == model.root]
    menu_edges = [e for e in home_edges if e["link_type"] == "menu"]
    menu_xps = {e["xpath"] for e in menu_edges}
    base = f"http://{CFG.host(0)}"
    assert f'{MENU_XP}[@href="{base}/dir0"]' in menu_xps
    assert all(e["menu_type"] == "fixed" for e in menu_edges)


def test_mutable_menu_positional_blocks():
    """A menu whose items carry disjoint hrefs on two source pages is
    MUTABLE ⇒ positional index blocks across items (Menu.setType +
    MenuItem.useIndexes, Menu.java:51-59 / MenuItem.java:99-105)."""
    from smart_crawler_spark.modeler.dynamic import MPage, _to_graph

    def mk(url, title):
        return MPage(url=url, title=title, link_schema=[], out_links={},
                     label_values={})

    a, b = mk("http://s/a", "A"), mk("http://s/a2", "A")
    d1, d2 = mk("http://s/d1", "D"), mk("http://s/d2", "D")
    # same menu xpath on both pages; hrefs disjoint across pages
    a.page_links.append(("//u/li/a", "menu", [d1, d2], ["/p1", "/q1"]))
    b.page_links.append(("//u/li/a", "menu", [d1, d2], ["/p2", "/q2"]))
    clusters = [
        (a.to_stats("A"), [a, b]),
        (d1.to_stats("D1"), [d1]),
        (d2.to_stats("D2"), [d2]),
    ]
    model = _to_graph(clusters, {}, {}, "http://s/a")
    menu_edges = [e for e in model.class_links if e["link_type"] == "menu"]
    assert {e["xpath"] for e in menu_edges} == {"(//u/li/a)[1]", "(//u/li/a)[2]"}
    assert all(e["menu_type"] == "mutable" for e in menu_edges)


def test_fixed_menu_href_items_multi_page():
    """Same menu with identical hrefs on both pages stays FIXED ⇒ one
    href-predicated item per distinct href."""
    from smart_crawler_spark.modeler.dynamic import MPage, _to_graph

    def mk(url, title):
        return MPage(url=url, title=title, link_schema=[], out_links={},
                     label_values={})

    a, b = mk("http://s/a", "A"), mk("http://s/a2", "A")
    d1, d2 = mk("http://s/d1", "D"), mk("http://s/d2", "D")
    a.page_links.append(("//u/li/a", "menu", [d1, d2], ["/p1", "/q1"]))
    b.page_links.append(("//u/li/a", "menu", [d1, d2], ["/p1", "/q1"]))
    clusters = [
        (a.to_stats("A"), [a, b]),
        (d1.to_stats("D1"), [d1]),
        (d2.to_stats("D2"), [d2]),
    ]
    model = _to_graph(clusters, {}, {}, "http://s/a")
    menu_xps = {e["xpath"] for e in model.class_links if e["link_type"] == "menu"}
    assert menu_xps == {'//u/li/a[@href="/p1"]', '//u/li/a[@href="/q1"]'}


def test_dir_list_and_next(nav):
    _dm, model = nav
    list_edges = [e for e in model.class_links if e["link_type"] == "list"]
    assert any(e["xpath"] == LIST_XP for e in list_edges)
    # NEXT: dir class links to itself via the singleton xpath
    next_edges = [e for e in model.class_links if e["xpath"] == NEXT_XP]
    assert next_edges and all(
        e["src_class"] == e["dst_class"] for e in next_edges
    )
    assert all(e["link_type"] == "singleton" for e in next_edges)


def test_detail_cluster_depth(nav):
    dm, model = nav
    detail_classes = {
        e["dst_class"]
        for e in model.class_links
        if e["xpath"] == LIST_XP and e["link_type"] == "list"
    }
    assert detail_classes
    assert all(model.depths[c] == 2 for c in detail_classes)


def test_budget_respected():
    fetcher = CorpusFetcher(all_rows(CFG))
    dm = DynamicModeler(fetcher, f"http://{CFG.host(0)}/", model_pages=5)
    dm.run()
    assert dm.fetched <= 5


def test_model_drives_crawl(spark, nav, tmp_path):
    """End-to-end: inferred model → crawl engine drains the whole site."""
    from pyspark.sql import functions as F

    from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
    from smart_crawler_spark.datagen.site import generate_site_pages

    _dm, model = nav
    pages = generate_site_pages(spark, CFG).localCheckpoint()
    eng = CrawlEngine(
        spark, pages, model, str(tmp_path), EngineConfig(budget_per_host=4)
    )
    res = eng.run([f"http://{CFG.host(0)}/"])
    fetched = res.order.filter("fetched").count()
    # every page of the site is reachable under the inferred model
    assert fetched == pages.count()