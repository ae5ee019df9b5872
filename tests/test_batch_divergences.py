"""Latent-divergence regressions for batch mode and multi-host graphs.

Three reference-semantics properties that single-host, budget=1 fixtures
never exercise:

1. A link's frontier ``host`` is its OWN authority (politeness, budgets,
   the seen namespace — ``CrawlURL.getRelativeUrl`` keys the visited set
   by the URL itself, ``model/CrawlURL.java:86-99``), not the authority
   of the page that discovered it. Partitioning the intra-batch dedup on
   the source host would silently fuse ``http://a/x`` and ``http://b/x``.
2. Records are per DISPATCH: the reference emits one record per fetched
   CrawlURL (``actors/CrawlPage.java``), so two same-round dispatches
   that share a final URL (a redirect pair, or two form-param variants
   of one URL) must stay two records — grouping on the final URL alone
   concatenates their field lists into one malformed record.
3. Intra-batch first-enqueuer ties between two form variants of one
   source URL resolve in the reference's dequeue order: the frontier
   comparator sorts form_params (nulls first) after url
   (``model/PageClass.java:462-468``), so the variant with the smaller
   params enqueues its classification first.
"""

from pyspark.sql import functions as F

from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
from smart_crawler_spark.crawler.oracle import crawl_all
from smart_crawler_spark.datagen.site import SITE_PAGES_SCHEMA
from smart_crawler_spark.sources.targets import load_target_tsv


def _page(url, true_class, out_links=None, data_values=None, redirect_to=None):
    from urllib.parse import urlsplit

    return {
        "url": url,
        "host": urlsplit(url.split(">", 1)[0]).netloc.lower(),
        "true_class": true_class,
        "title": true_class,
        "link_schema": sorted(out_links or {}),
        "label_schema": sorted(data_values or {}),
        "out_links": out_links or {},
        "data_values": data_values or {},
        "image_id": None,
        "caption_xpath": None,
        "redirect_to": redirect_to,
        "fetch_fail_n": 0,
    }


def _run(spark, tmp_path, rows, tsv, seeds, budget):
    model = load_target_tsv(tsv)
    pages = spark.createDataFrame(rows, SITE_PAGES_SCHEMA)
    eng = CrawlEngine(
        spark, pages, model, str(tmp_path), EngineConfig(budget_per_host=budget)
    )
    res = eng.run(seeds)
    oracle = crawl_all(rows, model, seeds)
    return res, oracle


def _assert_seen_matches(spark, res, oracle):
    keys = sorted({k for o in oracle.values() for k in o.seen})
    want = {
        r["h"]
        for r in spark.createDataFrame([(k,) for k in keys], "k string")
        .select(F.xxhash64("k").alias("h"))
        .collect()
    }
    assert {r["url_hash"] for r in res.seen.collect()} == want


def _record_set(res):
    return {
        (r["url"], r["page_class"], tuple(r["fields"]))
        for r in res.records.collect()
    }


def _oracle_record_set(oracle):
    return {
        (rec["url"], rec["page_class"], tuple(rec["fields"]))
        for o in oracle.values()
        for rec in o.records
    }


XP_EXT = '//a[@id="ext"]'
XP_H1 = "//h1/text()"


def test_cross_host_links_get_own_authority(spark, tmp_path):
    tsv = "\n".join(
        [
            f"home\tlink\t{XP_EXT}\text\tlist",
            f"ext\tstring\t{XP_H1}\tname",
        ]
    )
    rows = [
        _page(
            "http://a.test/",
            "home",
            out_links={XP_EXT: ["http://b.test/p1", "http://b.test/p2"]},
        ),
        _page("http://b.test/p1", "ext", data_values={XP_H1: "P1"}),
        _page("http://b.test/p2", "ext", data_values={XP_H1: "P2"}),
    ]
    res, oracle = _run(spark, tmp_path, rows, tsv, ["http://a.test/"], budget=1)

    order = res.order.collect()
    # frontier invariant: host == the URL's own authority, even for
    # links discovered on another host
    for r in order:
        assert r["url"].split("/")[2] == r["host"], r
    assert {(r["url"], r["page_class"], r["fetched"]) for r in order} == {
        (o["url"], o["page_class"], o["fetched"])
        for o in oracle["a.test"].order
    }
    assert len(order) == len(oracle["a.test"].order) == 3
    _assert_seen_matches(spark, res, oracle)
    assert _record_set(res) == _oracle_record_set(oracle) == {
        ("http://b.test/p1", "ext", ("P1",)),
        ("http://b.test/p2", "ext", ("P2",)),
    }
    # politeness/budget grouping followed the link's own host
    assert {r["host"] for r in res.records.collect()} == {"b.test"}


LIST_XP = '//ul[@id="l"]/li/a'


def test_redirect_pair_same_round_is_two_records(spark, tmp_path):
    tsv = "\n".join(
        [
            f"home\tlink\t{LIST_XP}\titem\tlist",
            f"item\tstring\t{XP_H1}\ttitle",
        ]
    )
    rows = [
        _page(
            "http://h.test/",
            "home",
            out_links={LIST_XP: ["http://h.test/a", "http://h.test/b"]},
        ),
        # /a redirects to /b; both dispatched in ONE round (budget 4)
        _page("http://h.test/a", "item", redirect_to="http://h.test/b"),
        _page("http://h.test/b", "item", data_values={XP_H1: "B"}),
    ]
    res, oracle = _run(spark, tmp_path, rows, tsv, ["http://h.test/"], budget=4)

    recs = res.records.collect()
    # one record per dispatch — the old final-url grouping concatenated
    # the two dispatches' fields into one ["B", "B"] row
    assert len(recs) == len(oracle["h.test"].records) == 2
    for r in recs:
        assert (r["url"], r["page_class"], list(r["fields"])) == (
            "http://h.test/b",
            "item",
            ["B"],
        )
    _assert_seen_matches(spark, res, oracle)
    got = {(r["url"], r["fetched"]) for r in res.order.collect()}
    assert got == {(o["url"], o["fetched"]) for o in oracle["h.test"].order}


def test_redirect_to_absent_target_keeps_source_content(spark, tmp_path):
    """A redirect whose target is not in the corpus still counts as
    fetched with the response's own content (the oracle falls back to
    the source row, crawler/oracle.py pages.get(final, page)); the
    target URL still joins the seen set (CrawlPage.java:55,140-141)."""
    tsv = "\n".join(
        [
            f"home\tlink\t{LIST_XP}\titem\tlist",
            f"item\tstring\t{XP_H1}\ttitle",
        ]
    )
    rows = [
        _page(
            "http://h.test/",
            "home",
            out_links={LIST_XP: ["http://h.test/a"]},
        ),
        _page(
            "http://h.test/a",
            "item",
            data_values={XP_H1: "A"},
            redirect_to="http://gone.test/x",
        ),
    ]
    res, oracle = _run(spark, tmp_path, rows, tsv, ["http://h.test/"], budget=1)
    want = oracle["h.test"]
    got = {(r["url"], r["fetched"]) for r in res.order.collect()}
    assert got == {(o["url"], o["fetched"]) for o in want.order}
    assert ("http://h.test/a", True) in got
    _assert_seen_matches(spark, res, oracle)  # incl. gone.test|/x
    assert "gone.test|/x" in want.seen
    assert _record_set(res) == _oracle_record_set(oracle) == {
        ("http://gone.test/x", "item", ("A",))
    }


F1_XP = '//form[@id="f1"]'
F2_XP = '//form[@id="f2"]'
X1_XP = '//a[@id="x1"]'
X2_XP = '//a[@id="x2"]'
P_XP = "//p/text()"


def test_form_variants_records_and_first_enqueuer_tiebreak(spark, tmp_path):
    tsv = "\n".join(
        [
            f"home\tlink\t{F1_XP}\tresults\tform",
            f"home\tlink\t{F2_XP}\tresults\tform",
            f"results\tlink\t{X1_XP}\tcx\tlist",
            f"results\tlink\t{X2_XP}\tcy\tlist",
            f"results\tstring\t{P_XP}\trtext",
            f"cx\tstring\t{XP_H1}\tname",
            f"cy\tstring\t{XP_H1}\tname",
        ]
    )
    s = "http://h.test/s"
    rows = [
        _page(
            "http://h.test/",
            "home",
            out_links={F1_XP: [s + ">q=a;"], F2_XP: [s + ">q=b;"]},
        ),
        # POST-sensitive corpus: each param set has its own response
        # content (CrawlPage.fetchUrl:135-141); variant a links to /x
        # via x1 (-> cx), variant b via x2 (-> cy)
        _page(
            s + ">q=a;",
            "results",
            out_links={X1_XP: ["http://h.test/x"]},
            data_values={P_XP: "A"},
        ),
        _page(
            s + ">q=b;",
            "results",
            out_links={X2_XP: ["http://h.test/x"]},
            data_values={P_XP: "B"},
        ),
        _page("http://h.test/x", "cx", data_values={XP_H1: "X"}),
    ]
    res, oracle = _run(spark, tmp_path, rows, tsv, ["http://h.test/"], budget=4)
    want = oracle["h.test"]

    # the oracle dequeues q=a; first (form_params tiebreak) -> /x is cx
    x = [o for o in want.order if o["url"] == "http://h.test/x"]
    assert [o["page_class"] for o in x] == ["cx"]
    got_x = [r for r in res.order.collect() if r["url"] == "http://h.test/x"]
    assert [(r["page_class"], r["fetched"]) for r in got_x] == [("cx", True)]

    # both form dispatches fetched in the SAME round (the batch regime
    # under test), each emitting its own record
    rounds = {
        r["round"] for r in res.order.collect() if r["url"] == s
    }
    assert len(rounds) == 1
    recs = _record_set(res)
    assert recs == _oracle_record_set(oracle) == {
        (s, "results", ("A",)),
        (s, "results", ("B",)),
        ("http://h.test/x", "cx", ("X",)),
    }
    assert res.records.count() == len(want.records) == 3
    _assert_seen_matches(spark, res, oracle)
