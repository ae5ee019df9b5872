"""Lossless mid-crawl resume (north_rule): kill after a mid-round
snapshot (batch in flight, not yet fetched) → resume → identical final
crawl order, seen set, and records as an uninterrupted run."""

import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
from smart_crawler_spark.datagen.site import SiteConfig, generate_site_pages, target_tsv
from smart_crawler_spark.frontier.checkpoint import CrawlCheckpoint
from smart_crawler_spark.sources.targets import load_target_tsv

CFG = SiteConfig(n_hosts=1, dirs=2, chain=2, details_per_page=2, n_images=10)


@pytest.fixture(scope="module")
def site(spark):
    model = load_target_tsv(target_tsv(CFG))
    pages = generate_site_pages(spark, CFG).localCheckpoint()
    seeds = [f"http://{CFG.host(0)}/"]
    return model, pages, seeds


def _summary(res):
    order = [
        (r["host"], r["seq"], r["url"], r["page_class"], r["fetched"])
        for r in res.order.orderBy("host", "seq").collect()
    ]
    seen = sorted(r["url_hash"] for r in res.seen.collect())
    records = sorted(
        (r["url"], r["page_class"], tuple(r["fields"]))
        for r in res.records.collect()
    )
    return order, seen, records


def test_kill_and_resume(spark, site, tmp_path):
    model, pages, seeds = site

    base = CrawlEngine(
        spark, pages, model, str(tmp_path / "base"), EngineConfig(budget_per_host=1)
    ).run(seeds)
    want = _summary(base)

    crash_cfg = EngineConfig(budget_per_host=1, checkpoint_every=1, crash_at_round=4)
    crashed = CrawlEngine(
        spark, pages, model, str(tmp_path / "killed"), crash_cfg
    ).run(seeds)
    assert crashed.frontier.count() > 0 or crashed.rounds == 4

    resume_cfg = EngineConfig(budget_per_host=1, checkpoint_every=1)
    resumed = CrawlEngine(
        spark, pages, model, str(tmp_path / "killed"), resume_cfg
    ).run(resume=True)
    assert _summary(resumed) == want


def test_snapshot_lineage_metrics(spark, site, tmp_path):
    model, pages, seeds = site
    cfg = EngineConfig(budget_per_host=2, checkpoint_every=2)
    CrawlEngine(spark, pages, model, str(tmp_path / "cp"), cfg).run(seeds)
    ckpt = CrawlCheckpoint(spark, str(tmp_path / "cp" / "checkpoints"))
    rounds = ckpt.committed_rounds()
    assert rounds and all(r % 2 == 0 for r in rounds)
    snap = ckpt.latest()
    # per-partition lineage rows present with the snapshot's round stamp
    assert {"partition_id", "frontier_rows", "round"} <= set(snap.metrics.columns)
    # per-host counters are a snapshot TABLE (never a driver dict)
    stats = {r["host"]: (r["seq"], r["fetched"]) for r in snap.host_stats.collect()}
    assert stats and all(s >= f > 0 for s, f in stats.values())
    assert snap.seen.filter(F.col("url_hash").isNull()).count() == 0


def test_legacy_snapshot_without_host_stats(spark, tmp_path):
    """Snapshots written before host_stats became a part must still
    load: the old driver-dict extras migrate into the stats table."""
    import shutil

    from smart_crawler_spark.frontier.checkpoint import HOST_STATS_SCHEMA

    ckpt = CrawlCheckpoint(spark, str(tmp_path / "legacy"))
    frontier = spark.createDataFrame(
        [("http://h/a", "h", "c", 0, "c", None)],
        "url string, host string, page_class string, class_depth int,"
        " class_name string, form_params string",
    )
    ckpt.write(
        1,
        frontier,
        spark.createDataFrame([], "url_hash long"),
        frontier.limit(0),
        spark.createDataFrame([], "partition_id int, frontier_rows long"),
        spark.createDataFrame([], HOST_STATS_SCHEMA),
        extras={"host_seq": {"h": 3}, "host_fetched": {"h": 2}},
    )
    shutil.rmtree(tmp_path / "legacy" / "round=1" / "host_stats")
    snap = ckpt.latest()
    stats = {r["host"]: (r["seq"], r["fetched"]) for r in snap.host_stats.collect()}
    assert stats == {"h": (3, 2)}
    assert snap.frontier.count() == 1
