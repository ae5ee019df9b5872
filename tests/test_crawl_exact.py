"""End-to-end crawl: the Spark engine must match the pure-Python oracle
(reference semantics) EXACTLY — per-host crawl order, final URL-seen set,
and every extracted record — under the same seed list and politeness
budget (north_rule). Batch mode (politeness budget > 1) must preserve the
seen set + records."""

import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
from smart_crawler_spark.crawler.oracle import crawl_all
from smart_crawler_spark.datagen.images import generate_images, image_caption
from smart_crawler_spark.datagen.site import (
    SiteConfig,
    all_rows,
    generate_site_pages,
    target_tsv,
)
from smart_crawler_spark.sources.targets import load_target_tsv

CFG = SiteConfig(n_hosts=2, dirs=2, chain=2, details_per_page=2, n_images=20)


@pytest.fixture(scope="module")
def site(spark):
    model = load_target_tsv(target_tsv(CFG))
    pages = generate_site_pages(spark, CFG).localCheckpoint()
    seeds = [f"http://{CFG.host(k)}/" for k in range(CFG.n_hosts)]
    oracle = crawl_all(all_rows(CFG), model, seeds)
    return model, pages, seeds, oracle


def _engine_results(spark, site, tmpdir, cfg: EngineConfig):
    model, pages, seeds, _ = site
    engine = CrawlEngine(spark, pages, model, str(tmpdir), cfg)
    return engine.run(seeds)


def _oracle_order(oracle, host):
    return [
        (o["seq"], o["url"], o["page_class"], o["fetched"])
        for o in oracle[host].order
    ]


def test_exact_order_seen_records(spark, site, tmp_path):
    model, pages, seeds, oracle = site
    res = _engine_results(spark, site, tmp_path / "seq", EngineConfig(budget_per_host=1))

    # 1. per-host crawl order — exact sequence match
    got = res.order.orderBy("host", "seq").collect()
    for host in oracle:
        got_host = [
            (r["seq"], r["url"], r["page_class"], r["fetched"])
            for r in got
            if r["host"] == host
        ]
        assert got_host == _oracle_order(oracle, host), host

    # 2. URL-seen set — exact match (hash the oracle's canonical keys)
    oracle_keys = sorted({k for o in oracle.values() for k in o.seen})
    oracle_hashes = {
        r["h"]
        for r in spark.createDataFrame([(k,) for k in oracle_keys], "k string")
        .select(F.xxhash64("k").alias("h"))
        .collect()
    }
    got_hashes = {r["url_hash"] for r in res.seen.collect()}
    assert got_hashes == oracle_hashes

    # 3. records — exact match including field order
    want = {
        (rec["url"], rec["page_class"], tuple(rec["fields"]))
        for o in oracle.values()
        for rec in o.records
    }
    got_recs = {
        (r["url"], r["page_class"], tuple(r["fields"]))
        for r in res.records.collect()
    }
    assert got_recs == want and len(want) > 0

    # 4. frontier fully drained
    assert res.frontier.count() == 0


def test_caption_invariant(spark, site, tmp_path):
    """Extracted caption == corpus caption for the page's image (input_hint)."""
    res = _engine_results(
        spark, site, tmp_path / "cap", EngineConfig(budget_per_host=4)
    )
    images = generate_images(spark, CFG.n_images, jpeg_every=0)
    details = res.records.filter("page_class = 'detail'").select(
        "url",
        F.element_at("fields", 2).alias("caption"),
        F.regexp_replace(F.element_at("fields", 3), r"\.png$", "").alias("image_id"),
    )
    joined = details.join(images.select("image_id", F.col("caption").alias("want")),
                          "image_id", "inner")
    assert joined.count() == details.count()
    assert joined.filter("caption != want").count() == 0
    # and the caption function itself is the deterministic generator
    row = joined.first()
    idx = int(row["image_id"][3:])
    assert row["caption"] == image_caption(idx)


def test_batch_mode_same_seen_and_records(spark, site, tmp_path):
    model, pages, seeds, oracle = site
    res = _engine_results(
        spark, site, tmp_path / "batch",
        EngineConfig(budget_per_host=3, salt_buckets=4, use_bloom=True),
    )
    oracle_keys = sorted({k for o in oracle.values() for k in o.seen})
    oracle_hashes = {
        r["h"]
        for r in spark.createDataFrame([(k,) for k in oracle_keys], "k string")
        .select(F.xxhash64("k").alias("h"))
        .collect()
    }
    assert {r["url_hash"] for r in res.seen.collect()} == oracle_hashes
    want = {
        (rec["url"], rec["page_class"], tuple(rec["fields"]))
        for o in oracle.values()
        for rec in o.records
    }
    got = {
        (r["url"], r["page_class"], tuple(r["fields"]))
        for r in res.records.collect()
    }
    assert got == want
    assert res.rounds < 14  # politeness budget shrinks rounds


def test_auto_bloom_path_selection(spark, site, tmp_path):
    """use_bloom='auto': each round picks bloom vs exact from the
    |seen|/|candidates| ratio; results must equal the exact path and
    the chosen path is reported in metrics (dedup_path)."""
    model, pages, seeds, oracle = site
    exact = _engine_results(
        spark, site, tmp_path / "auto_exact",
        EngineConfig(budget_per_host=3),
    )
    auto = _engine_results(
        spark, site, tmp_path / "auto_bloom",
        EngineConfig(budget_per_host=3, use_bloom="auto"),
    )
    assert {r["url_hash"] for r in auto.seen.collect()} == {
        r["url_hash"] for r in exact.seen.collect()
    }
    paths = {m.get("dedup_path") for m in auto.metrics}
    assert paths <= {"bloom", "exact"} and paths  # reported every round
    # lazy maintenance: bitmaps exist only from the first bloom round on
    # — an all-exact run never pays any bloom build/merge cost
    bloomed = False
    for m in auto.metrics:
        bloomed = bloomed or m["dedup_path"] == "bloom"
        assert m["bloom_built"] == bloomed


def test_page_budget(spark, site, tmp_path):
    model, pages, seeds, oracle = site
    res = _engine_results(
        spark, site, tmp_path / "budget",
        EngineConfig(budget_per_host=1, max_pages_per_host=5),
    )
    per_host = {
        r["host"]: r["n"]
        for r in res.order.filter("fetched").groupBy("host")
        .agg(F.count("*").alias("n")).collect()
    }
    assert all(n == 5 for n in per_host.values())
    want = crawl_all(all_rows(CFG), model, seeds, max_pages=5)
    for host in want:
        got_host = [
            (r["seq"], r["url"], r["page_class"], r["fetched"])
            for r in res.order.filter(F.col("host") == host)
            .orderBy("seq").collect()
        ]
        assert got_host == _oracle_order(want, host), host


def test_global_page_budget(spark, site, tmp_path):
    """max_pages_total (cross-site generalization of the reference's
    per-frontier cap) caps TOTAL fetch
    attempts across hosts and rounds (CrawlFrontier.java:148-155)."""
    res = _engine_results(
        spark, site, tmp_path / "gbudget",
        EngineConfig(budget_per_host=1, max_pages_total=7),
    )
    assert res.order.count() == 7


def test_page_budget_counts_dispatches(spark, tmp_path):
    """Reference pageCount increments per DISPATCH (sendURL,
    CrawlFrontier.java:132-139), so failed fetches consume the page
    budget too. A corpus with permanently-failing pages (fail_every +
    max_tries=1) must yield identical order/budget behavior in engine
    and oracle — and strictly fewer successes than the cap."""
    cfg_site = SiteConfig(
        n_hosts=1, dirs=2, chain=2, details_per_page=3, n_images=20,
        fail_every=3,
    )
    model = load_target_tsv(target_tsv(cfg_site))
    pages = generate_site_pages(spark, cfg_site).localCheckpoint()
    seeds = [f"http://{cfg_site.host(0)}/"]
    cap = 14
    oracle = crawl_all(
        all_rows(cfg_site), model, seeds, max_pages=cap, max_tries=1
    )
    engine = CrawlEngine(
        spark, pages, model, str(tmp_path / "dispatch"),
        EngineConfig(budget_per_host=1, max_pages_per_host=cap, max_tries=1),
    )
    res = engine.run(seeds)
    host = cfg_site.host(0)
    got = [
        (r["seq"], r["url"], r["page_class"], r["fetched"])
        for r in res.order.orderBy("seq").collect()
    ]
    assert got == _oracle_order(oracle, host)
    # the cap bounds dispatches exactly...
    assert len(got) == cap
    # ...and with failures in range, successes land strictly under it
    n_ok = sum(1 for g in got if g[3])
    assert 0 < n_ok < cap


def test_batch_mode_ranged_pick_same_seen_and_records(spark, site, tmp_path, monkeypatch):
    """The giant-budget ranged pick (frontier/queue.py
    ranged_priority_rank) must leave the crawl oracle-exact: force the
    engine onto that path by dropping the threshold below the budget."""
    import smart_crawler_spark.crawler.engine as engmod

    monkeypatch.setattr(engmod, "RANGED_BUDGET_THRESHOLD", 1)
    model, pages, seeds, oracle = site
    res = _engine_results(
        spark, site, tmp_path / "ranged",
        EngineConfig(budget_per_host=3, salt_buckets=0),
    )
    oracle_keys = sorted({k for o in oracle.values() for k in o.seen})
    oracle_hashes = {
        r["h"]
        for r in spark.createDataFrame([(k,) for k in oracle_keys], "k string")
        .select(F.xxhash64("k").alias("h"))
        .collect()
    }
    assert {r["url_hash"] for r in res.seen.collect()} == oracle_hashes
    want = {
        (rec["url"], rec["page_class"], tuple(rec["fields"]))
        for o in oracle.values()
        for rec in o.records
    }
    got = {
        (r["url"], r["page_class"], tuple(r["fields"]))
        for r in res.records.collect()
    }
    assert got == want
