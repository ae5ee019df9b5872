"""Form/POST links (S3/E2): hrefs encoded as "url>k=v;k2=v2" become
frontier rows with form_params; identity, ordering and dedup follow the
reference (same URL with different params = distinct pages; same params
= duplicate)."""

import pytest

from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
from smart_crawler_spark.crawler.oracle import crawl_all
from smart_crawler_spark.datagen.site import SITE_PAGES_SCHEMA
from smart_crawler_spark.sources.targets import parse_target_rows

MODEL_ROWS = [
    ["home", "link", "//form//a", "result", "form"],
    ["result", "string", "//h1/text()", "title"],
]


def _page(url, cls, out=None, data=None):
    return {
        "url": url, "host": "h.test", "true_class": cls, "title": cls,
        "link_schema": [], "label_schema": [], "out_links": out or {},
        "data_values": data or {}, "image_id": None, "caption_xpath": None,
        "redirect_to": None, "fetch_fail_n": 0,
    }


PAGES = [
    _page(
        "http://h.test/",
        "home",
        out={
            "//form//a": [
                "http://h.test/search>q=alpha",
                "http://h.test/search>q=beta",
                "http://h.test/search>q=alpha",  # dup: same url+params
            ]
        },
    ),
    _page("http://h.test/search", "result", data={"//h1/text()": "results"}),
]


def test_form_params_distinguish_pages(spark, tmp_path):
    model = parse_target_rows(MODEL_ROWS)
    pages_df = spark.createDataFrame(PAGES, SITE_PAGES_SCHEMA)
    eng = CrawlEngine(
        spark, pages_df, model, str(tmp_path), EngineConfig(budget_per_host=1)
    )
    res = eng.run(["http://h.test/"])

    order = [
        (r["url"], r["fetched"]) for r in res.order.orderBy("seq").collect()
    ]
    # home + two distinct form fetches (the duplicate is deduped)
    assert len(order) == 3
    assert order[0][0] == "http://h.test/"
    assert order[1][0] == order[2][0] == "http://h.test/search"

    want = crawl_all(PAGES, model, ["http://h.test/"])["h.test"]
    assert [o["url"] for o in want.order] == [u for u, _ in order]
    assert res.seen.count() == len(want.seen) == 3
    # records: one per fetched form page
    assert res.records.count() == 2


def test_get_only_model_skips_corpus_probe(spark, tmp_path):
    """Form sensitivity derives from the MODEL (only form-type class
    links can put form_params into the frontier, CrawlPage.java:159-167)
    — a GET-only model stays on the single-join fetch without scanning
    the corpus, even if the corpus happens to carry '>' keyed rows
    (unreachable without form links)."""
    get_model = parse_target_rows(
        [["home", "link", "//a", "result", "list"],
         ["result", "string", "//h1/text()", "title"]]
    )
    pages = PAGES + [_page("http://h.test/search>q=alpha", "result")]
    pages_df = spark.createDataFrame(pages, SITE_PAGES_SCHEMA)
    eng = CrawlEngine(
        spark, pages_df, get_model, str(tmp_path / "get"),
        EngineConfig(budget_per_host=1),
    )
    assert eng._form_sensitive is False
    # the form-modeled engine on the same corpus stays param-sensitive
    eng2 = CrawlEngine(
        spark, pages_df, parse_target_rows(MODEL_ROWS),
        str(tmp_path / "form"), EngineConfig(budget_per_host=1),
    )
    assert eng2._form_sensitive is True


def test_form_params_split_at_first_gt(spark, tmp_path):
    """A '>' inside a param VALUE must stay in form_params: the split is
    at the FIRST '>' (oracle url.split('>', 1); CrawlURLFactory keeps
    everything after it), not the last."""
    model = parse_target_rows(MODEL_ROWS)
    pages = [
        _page(
            "http://h.test/", "home",
            out={"//form//a": ["http://h.test/search>q=a>b;"]},
        ),
        _page("http://h.test/search", "result",
              data={"//h1/text()": "get"}),
        # the POST-response row keyed by the FULL param blob
        _page("http://h.test/search>q=a>b;", "result",
              data={"//h1/text()": "post"}),
    ]
    pages_df = spark.createDataFrame(pages, SITE_PAGES_SCHEMA)
    res = CrawlEngine(
        spark, pages_df, model, str(tmp_path),
        EngineConfig(budget_per_host=1),
    ).run(["http://h.test/"])
    want = crawl_all(pages, model, ["http://h.test/"])["h.test"]
    got_order = [
        (r["seq"], r["url"], r["fetched"])
        for r in res.order.orderBy("seq").collect()
    ]
    assert got_order == [
        (o["seq"], o["url"], o["fetched"]) for o in want.order
    ]
    # the form fetch answered from the POST row, not the GET fallback
    recs = {tuple(r["fields"]) for r in res.records.collect()}
    assert ("post",) in recs
    assert res.seen.count() == len(want.seen)
