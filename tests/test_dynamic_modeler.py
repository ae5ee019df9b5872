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


def test_home_menu_indexed(nav):
    _dm, model = nav
    home_edges = [e for e in model.class_links if e["src_class"] == model.root]
    menu_xps = {e["xpath"] for e in home_edges if e["link_type"] == "menu"}
    assert f"({MENU_XP})[1]" in menu_xps  # DynamicModelerTest toDirectory


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