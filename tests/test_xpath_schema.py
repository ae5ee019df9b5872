"""XPath lattice (M2/M3) vs reference doctest examples
(XPath.java:34-57,111-145) and HTML page-schema extraction (M1, E1,
E4-E7) — including the full Spark pipeline: raw HTML → extracted schema
→ clustering → navigation model with indexed menus."""

import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.datagen.site import (
    DETAIL_MENU_XP,
    IMG_XP,
    LIST_XP,
    MENU_XP,
    NEXT_XP,
    TITLE_XP,
    SiteConfig,
    all_rows,
    page_html,
)
from smart_crawler_spark.modeler.schema import (
    extract_page_schemas,
    extract_record,
    extract_schema,
    is_valid_link,
)
from smart_crawler_spark.modeler.xpath import XPath

DOC_CHAIN = [
    ("a", [("class", "det"), ("href", "/detail1.html")]),
    ("li", []),
    ("ul", [("class", "list")]),
    ("div", [("id", "content")]),
    ("div", [("id", "site_content")]),
    ("div", [("id", "main")]),
    ("body", []),
    ("html", []),
]


def test_default_xpath_doctest():
    # XPath.java:34-57: cut at nearest id ancestor; anchor keeps all
    # attribute names; intermediates keep first attribute name
    xp = XPath(DOC_CHAIN)
    assert xp.default == '//div[@id="content"]/ul[@class]/li/a[@class]'


def test_finer_coarser_lattice():
    xp = XPath(DOC_CHAIN)
    # finer: add value to last incrementable tag (anchor side first)
    assert xp.finer() == '//div[@id="content"]/ul[@class]/li/a[@class="det"]'
    # coarser removes from the root side: id value first
    xp2 = XPath(DOC_CHAIN)
    assert xp2.coarser() == '//div[@id]/ul[@class]/li/a[@class]'
    assert xp2.coarser() == '//div/ul[@class]/li/a[@class]'
    assert xp2.coarser() == '//ul[@class]/li/a[@class]'
    # coarsest is the bare anchor (XPath.java:185-192)
    assert XPath(DOC_CHAIN).coarsest() == "//a"
    # finest enables everything with values
    fin = XPath(DOC_CHAIN).finest()
    assert fin.startswith("/html/body/div[@id=") and 'a[@class="det"]' in fin


def test_refine_roundtrip():
    xp = XPath(DOC_CHAIN)
    assert xp.refine(finer=True)
    n = 0
    while xp.refine(finer=True):
        n += 1
        assert n < 50
    # at the finest point, no further refinement
    assert xp.finer() == ""


def test_anchor_id_cuts_at_anchor():
    xp = XPath([("a", [("id", "page"), ("href", "/x")]), ("body", []), ("html", [])])
    assert xp.default == '//a[@id="page"]'


def test_link_validity_filter():
    base = "http://h.test/dir"
    assert is_valid_link("/detail/1", base) == "http://h.test/detail/1"
    assert is_valid_link("detail/2", base) == "http://h.test/detail/2"
    assert is_valid_link("#frag", base) is None
    assert is_valid_link("javascript:void(0)", base) is None
    assert is_valid_link("mailto:a@b.c", base) is None
    assert is_valid_link("http://other.test/x", base) is None
    assert is_valid_link("/pic.jpg", base) is None
    assert is_valid_link("/detail/3/", base) == "http://h.test/detail/3"


CFG = SiteConfig(n_hosts=1, dirs=2, chain=2, details_per_page=3, n_images=10)


def test_extraction_matches_declared_graph():
    """M1 on rendered HTML reproduces the declared site-graph columns."""
    for row in all_rows(CFG):
        got = extract_schema(row["url"], page_html(row))
        assert got["link_schema"] == row["link_schema"], row["url"]
        # menus are stored indexed in the model; flatten for comparison
        want_flat: dict[str, list] = {}
        for xp, hrefs in row["out_links"].items():
            base = xp.split(")[")[0].lstrip("(") if xp.startswith("(") else xp
            want_flat.setdefault(base, []).extend(hrefs)
        assert got["out_links"] == want_flat, row["url"]


def test_record_extraction_from_html():
    detail = next(r for r in all_rows(CFG) if r["true_class"] == "detail")
    rec = extract_record(
        page_html(detail),
        [
            {"xpath": TITLE_XP, "dtype": "string"},
            {"xpath": IMG_XP, "dtype": "img"},
            {"xpath": f"({DETAIL_MENU_XP})[2]", "dtype": "url"},
        ],
    )
    assert rec[0] == detail["data_values"][TITLE_XP]
    assert rec[1].endswith(".png")
    assert rec[2].endswith("/dir1")


def test_html_to_model_pipeline(spark):
    """raw HTML corpus → M1 UDF → clustering → typed navigation model."""
    import pandas as pd

    from smart_crawler_spark.modeler.cluster import cluster_pages
    from smart_crawler_spark.modeler.graph import build_navigation_model

    rows = all_rows(CFG)
    html_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [r["url"] for r in rows],
                "html": [page_html(r) for r in rows],
                "title": [r["title"] for r in rows],
            }
        )
    )
    extracted = extract_page_schemas(html_df).join(
        html_df.select("url", "title"), "url"
    )
    model, assigned = cluster_pages(extracted)
    nav = build_navigation_model(assigned, f"http://{CFG.host(0)}/")
    assert nav.depths[nav.root] == 0 and max(nav.depths.values()) == 2
    by_type = {}
    for e in nav.class_links:
        by_type.setdefault(e["link_type"], []).append(e)
    # home menu rebuilt as href-predicated fixed-menu edges (the menu
    # shows the same links on every source page => FIXED, MenuItem
    # hrefXPath form)
    menu_xps = {e["xpath"] for e in by_type.get("menu", [])}
    assert f'{MENU_XP}[@href="http://{CFG.host(0)}/dir0"]' in menu_xps
    assert all(e["menu_type"] == "fixed" for e in by_type.get("menu", []))
    # dir list + NEXT singleton recovered
    assert any(e["xpath"] == LIST_XP for e in by_type.get("list", []))
    assert any(e["xpath"] == NEXT_XP for e in by_type.get("singleton", []))
