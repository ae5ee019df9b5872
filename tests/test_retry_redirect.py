"""Fetch retry (F7) + redirect adoption (E8), engine vs oracle, on
hand-built page graphs."""

import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
from smart_crawler_spark.crawler.oracle import crawl_all, seen_key
from smart_crawler_spark.datagen.site import SITE_PAGES_SCHEMA
from smart_crawler_spark.sources.targets import parse_target_rows

MODEL_ROWS = [
    ["home", "link", "//ul/li/a", "detail", "list"],
    ["detail", "string", "//h1/text()", "title"],
]


def _page(url, cls, out=None, data=None, redirect=None, fail=0):
    return {
        "url": url,
        "host": "h.test",
        "true_class": cls,
        "title": cls,
        "link_schema": [],
        "label_schema": [],
        "out_links": out or {},
        "data_values": data or {},
        "image_id": None,
        "caption_xpath": None,
        "redirect_to": redirect,
        "fetch_fail_n": fail,
    }


PAGES = [
    _page(
        "http://h.test/",
        "home",
        out={"//ul/li/a": [
            "http://h.test/d1", "http://h.test/d2",
            "http://h.test/d3", "http://h.test/d4",
        ]},
    ),
    _page("http://h.test/d1", "detail", data={"//h1/text()": "one"}),
    # d2 fails once -> dropped when max_tries=1, fetched when max_tries=2
    _page("http://h.test/d2", "detail", data={"//h1/text()": "two"}, fail=1),
    # d3 redirects to d1: content/record adopted from d1, d1 joins seen
    _page("http://h.test/d3", "detail", redirect="http://h.test/d1"),
    _page("http://h.test/d4", "detail", data={"//h1/text()": "four"}),
]


@pytest.fixture(scope="module")
def model():
    return parse_target_rows(MODEL_ROWS)


def _run(spark, model, tmpdir, max_tries):
    pages_df = spark.createDataFrame(PAGES, SITE_PAGES_SCHEMA)
    eng = CrawlEngine(
        spark, pages_df, model, str(tmpdir),
        EngineConfig(budget_per_host=1, max_tries=max_tries),
    )
    return eng.run(["http://h.test/"])


@pytest.mark.parametrize("max_tries", [1, 2])
def test_engine_matches_oracle(spark, model, tmp_path, max_tries):
    res = _run(spark, model, tmp_path / f"t{max_tries}", max_tries)
    want = crawl_all(PAGES, model, ["http://h.test/"], max_tries=max_tries)["h.test"]

    got_order = [
        (r["seq"], r["url"], r["page_class"], r["fetched"])
        for r in res.order.orderBy("seq").collect()
    ]
    assert got_order == [
        (o["seq"], o["url"], o["page_class"], o["fetched"]) for o in want.order
    ]
    # d2 fetched only with a retry budget
    d2 = next(r for r in got_order if r[1].endswith("/d2"))
    assert d2[3] == (max_tries == 2)

    got_recs = sorted(
        (r["url"], tuple(r["fields"])) for r in res.records.collect()
    )
    assert got_recs == sorted(
        (rec["url"], tuple(rec["fields"])) for rec in want.records
    )
    # redirect: d3's record carries d1's final url + content
    assert ("http://h.test/d1", ("one",)) in got_recs
    urls = [u for u, _ in got_recs]
    assert urls.count("http://h.test/d1") == 2  # d1 itself + d3-redirect

    assert res.seen.count() == len(want.seen)
    assert seen_key("http://h.test/d1") in want.seen


def test_redirect_target_seen_at_fetch_blocks_same_round_links(
    spark, tmp_path
):
    """E8 seen timing: a redirect target enters the seen set the moment
    the redirecting page is FETCHED (oracle res.seen.add(final) before
    any later link enqueue) — so a link to that target discovered at or
    after the redirect is blocked, while one enqueued BEFORE the
    redirect stays queued and is dispatched."""
    model2 = parse_target_rows(
        [
            ["home", "link", "//x", "det", "list"],
            ["det", "link", "//y", "det", "list"],
            ["det", "string", "//h1/text()", "title"],
        ]
    )
    pages = [
        _page("http://h.test/", "home",
              out={"//x": ["http://h.test/a", "http://h.test/z",
                           "http://h.test/z2"]}),
        # keep case: /a enqueues /b BEFORE /z's redirect adds it to seen
        _page("http://h.test/a", "det", out={"//y": ["http://h.test/b"]},
              data={"//h1/text()": "a"}),
        _page("http://h.test/b", "det", out={"//y": ["http://h.test/b"]},
              data={"//h1/text()": "b"}),
        _page("http://h.test/z", "det", redirect="http://h.test/b"),
        # blocked case: /c is reachable ONLY through /z2's adopted
        # content — the redirect fetch marks /c seen first
        _page("http://h.test/z2", "det", redirect="http://h.test/c"),
        _page("http://h.test/c", "det", out={"//y": ["http://h.test/c"]},
              data={"//h1/text()": "c"}),
    ]
    pages_df = spark.createDataFrame(pages, SITE_PAGES_SCHEMA)
    res = CrawlEngine(
        spark, pages_df, model2, str(tmp_path),
        EngineConfig(budget_per_host=1),
    ).run(["http://h.test/"])
    want = crawl_all(pages, model2, ["http://h.test/"])["h.test"]

    got_order = [
        (r["seq"], r["url"], r["fetched"])
        for r in res.order.orderBy("seq").collect()
    ]
    assert got_order == [
        (o["seq"], o["url"], o["fetched"]) for o in want.order
    ]
    urls = [u for _, u, _ in got_order]
    assert "http://h.test/b" in urls        # enqueued before the redirect
    assert "http://h.test/c" not in urls    # seen at z2's fetch, never dispatched
    assert {r["url_hash"] for r in res.seen.collect()} == {
        r["h"]
        for r in spark.createDataFrame(
            [(k,) for k in sorted(want.seen)], "k string"
        ).select(F.xxhash64("k").alias("h")).collect()
    }
