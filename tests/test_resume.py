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


def test_recrawl_pool_survives_resume(spark, site, tmp_path):
    """Recrawl expiry state (the dispatch pool) is part of the snapshot:
    stopping after round K (post-round snapshot) and resuming yields the
    same per-round dispatches, seen set, and expiry counts as one
    uninterrupted run. (A MID-round kill replays the in-flight batch in
    the next round number, which legitimately shifts later expiry
    timing — the lossless claim for recrawl is across post-round
    snapshots, the shape a scheduled shutdown takes.)"""

    def run(workdir, max_rounds, resume=False):
        cfg = EngineConfig(
            budget_per_host=1,
            recrawl_after_rounds=2,
            max_rounds=max_rounds,
            checkpoint_every=1,
        )
        model, pages, seeds = site
        eng = CrawlEngine(spark, pages, model, str(tmp_path / workdir), cfg)
        return eng.run(None if resume else seeds, resume=resume)

    want_res = run("rc_base", 9)
    want = _summary(want_res)
    want_exp = [(m["round"], m["expired"]) for m in want_res.metrics]
    assert sum(e for _, e in want_exp) > 0  # the sweep is live

    first = run("rc_split", 5)
    assert first.rounds == 5
    resumed = run("rc_split", 9, resume=True)
    assert _summary(resumed) == want
    resumed_exp = [(m["round"], m["expired"]) for m in resumed.metrics]
    # resumed metrics cover rounds 6..9; they must match the base run's
    assert resumed_exp == want_exp[5:]


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
    """Snapshots written before host_stats (and before versioned
    snapshot dirs) must still load: flat round=N/<part> layout, no
    "version" in the manifest, old driver-dict extras migrating into
    the stats table."""
    import json
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
    # flatten the versioned layout into the legacy on-disk shape
    d = tmp_path / "legacy" / "round=1"
    for part in ("frontier", "seen", "in_flight", "metrics"):
        shutil.move(str(d / "v=1" / part), str(d / part))
    shutil.rmtree(d / "v=1")
    with open(d / "_MANIFEST.json") as f:
        manifest = json.load(f)
    del manifest["version"]
    with open(d / "_MANIFEST.json", "w") as f:
        json.dump(manifest, f)

    snap = ckpt.latest()
    stats = {r["host"]: (r["seq"], r["fetched"]) for r in snap.host_stats.collect()}
    assert stats == {"h": (3, 2)}
    assert snap.frontier.count() == 1


def test_same_round_snapshots_never_rewrite_live_parts(spark, tmp_path):
    """The mid-round and post-round snapshots of one round go to fresh
    versioned dirs with the manifest flipped last — a writer dying
    mid-overwrite can never leave a valid manifest over torn parquet."""
    import json
    import os

    from smart_crawler_spark.frontier.checkpoint import HOST_STATS_SCHEMA

    ckpt = CrawlCheckpoint(spark, str(tmp_path / "vers"))
    frontier = spark.createDataFrame(
        [("http://h/a", "h", "c", 0, "c", None)],
        "url string, host string, page_class string, class_depth int,"
        " class_name string, form_params string",
    )

    def _write(n_rows):
        ckpt.write(
            2,
            frontier.limit(n_rows),
            spark.createDataFrame([(1, 0)], "url_hash long, shard int"),
            frontier.limit(0),
            spark.createDataFrame([], "partition_id int, frontier_rows long"),
            spark.createDataFrame([], HOST_STATS_SCHEMA),
        )

    _write(1)  # mid-round
    d = tmp_path / "vers" / "round=2"
    with open(d / "_MANIFEST.json") as f:
        assert json.load(f)["version"] == 1
    _write(0)  # post-round: new version, old dir GC'd after commit
    with open(d / "_MANIFEST.json") as f:
        assert json.load(f)["version"] == 2
    assert not os.path.isdir(d / "v=1")
    assert ckpt.latest().frontier.count() == 0


def test_resume_truncates_inflight_round_sinks(spark, site, tmp_path):
    """Crash window #2: the dying run appended round-N sink rows AFTER
    the mid-round snapshot of N — resume must drop them or the re-run
    of round N double-appends."""
    model, pages, seeds = site
    base = CrawlEngine(
        spark, pages, model, str(tmp_path / "base"), EngineConfig(budget_per_host=1)
    ).run(seeds)
    want = _summary(base)

    crash_cfg = EngineConfig(budget_per_host=1, checkpoint_every=1, crash_at_round=3)
    CrawlEngine(spark, pages, model, str(tmp_path / "k"), crash_cfg).run(seeds)
    # simulate what the crashed run would have written after the
    # snapshot: round-3 rows already in both sinks
    spark.createDataFrame(
        [(3, "poison.test", 999, "http://poison.test/", "c", True)],
        "round int, host string, seq long, url string, page_class string,"
        " fetched boolean",
    ).write.mode("append").parquet(str(tmp_path / "k" / "crawl_order"))
    spark.createDataFrame(
        [("http://poison.test/", "c", "poison.test", ["x"], 3)],
        "url string, page_class string, host string, fields array<string>,"
        " round int",
    ).write.mode("append").parquet(str(tmp_path / "k" / "records"))

    resumed = CrawlEngine(
        spark, pages, model, str(tmp_path / "k"),
        EngineConfig(budget_per_host=1, checkpoint_every=1),
    ).run(resume=True)
    assert _summary(resumed) == want
    assert resumed.order.filter("host = 'poison.test'").isEmpty()


def test_resume_with_changed_shard_count(spark, site, tmp_path):
    """The snapshot's shard column reflects the writing run's
    cfg.bloom.shards; resuming under a different shard count must
    recompute it, or the co-partitioned anti-join re-admits seen URLs."""
    from smart_crawler_spark.frontier.dedup import BloomConfig

    model, pages, seeds = site
    base = CrawlEngine(
        spark, pages, model, str(tmp_path / "base2"), EngineConfig(budget_per_host=1)
    ).run(seeds)
    want = _summary(base)

    crash_cfg = EngineConfig(
        budget_per_host=1, checkpoint_every=1, crash_at_round=3,
        bloom=BloomConfig(shards=64),
    )
    CrawlEngine(spark, pages, model, str(tmp_path / "ks"), crash_cfg).run(seeds)
    resumed = CrawlEngine(
        spark, pages, model, str(tmp_path / "ks"),
        EngineConfig(
            budget_per_host=1, checkpoint_every=1, bloom=BloomConfig(shards=7)
        ),
    ).run(resume=True)
    assert _summary(resumed) == want


def test_fresh_run_clears_stale_sinks(spark, site, tmp_path):
    """A fresh (non-resume) run in a reused workdir must not merge the
    previous run's sink parquet into its results."""
    model, pages, seeds = site
    d = str(tmp_path / "reuse")
    first = CrawlEngine(
        spark, pages, model, d, EngineConfig(budget_per_host=1)
    ).run(seeds)
    want = _summary(first)
    second = CrawlEngine(
        spark, pages, model, d, EngineConfig(budget_per_host=1)
    ).run(seeds)
    assert _summary(second) == want


def test_fresh_run_clears_stale_checkpoints(spark, site, tmp_path):
    """A fresh run in a reused workdir must drop the previous run's
    committed snapshots too: otherwise a later --resume restores the OLD
    run's round-N state (N past this run's last snapshot wins latest())
    over the new run's sinks — a corrupt mix of two runs."""
    model, pages, seeds = site
    wd = str(tmp_path / "wd")
    a = CrawlEngine(
        spark, pages, model, wd, EngineConfig(budget_per_host=1, checkpoint_every=1)
    ).run(seeds)
    assert a.rounds > 3
    # fresh shorter run B in the same workdir
    b = CrawlEngine(
        spark, pages, model, wd,
        EngineConfig(budget_per_host=1, checkpoint_every=1, max_pages_total=3),
    ).run(seeds)
    assert b.rounds < a.rounds
    latest = CrawlCheckpoint(spark, wd + "/checkpoints").latest()
    assert latest.round <= b.rounds  # A's stale round-N snapshots gone
    # resuming now continues B's crawl, never restores A's frontier
    resumed = CrawlEngine(
        spark, pages, model, wd,
        EngineConfig(budget_per_host=1, checkpoint_every=1, max_pages_total=3),
    ).run(resume=True)
    assert _summary(resumed) == _summary(b)


def test_truncate_sinks_survives_interrupted_swap(spark, site, tmp_path):
    """Crash-safety of the sink truncation swap: if a previous resume
    died between the two renames (live dir gone, filtered tmp copy
    complete), the next resume must heal and still produce the
    uninterrupted run's results."""
    import os

    model, pages, seeds = site
    want = _summary(
        CrawlEngine(
            spark, pages, model, str(tmp_path / "clean"),
            EngineConfig(budget_per_host=1, checkpoint_every=1),
        ).run(seeds)
    )
    wd = str(tmp_path / "killed")
    crash_cfg = EngineConfig(
        budget_per_host=1, checkpoint_every=1, crash_at_round=3
    )
    CrawlEngine(spark, pages, model, wd, crash_cfg).run(seeds)
    # simulate the torn state mid-swap: tmp holds the complete filtered
    # copy, the live dir is gone
    order_dir = os.path.join(wd, "crawl_order")
    os.replace(order_dir, order_dir + "._resume_tmp")
    resumed = CrawlEngine(
        spark, pages, model, wd,
        EngineConfig(budget_per_host=1, checkpoint_every=1),
    ).run(resume=True)
    assert _summary(resumed) == want


def test_resume_without_checkpointing_is_clear_error(spark, site, tmp_path):
    model, pages, _seeds = site
    eng = CrawlEngine(
        spark, pages, model, str(tmp_path), EngineConfig(checkpoint_every=0)
    )
    with pytest.raises(RuntimeError, match="checkpoint"):
        eng.run(resume=True)


def test_canonically_equal_seeds_collapse(spark, site, tmp_path):
    """Seeds that are distinct strings but one canonical page dispatch
    once (the oracle's enqueue-time seen check admits only the first)."""
    model, pages, seeds = site
    base = CrawlEngine(
        spark, pages, model, str(tmp_path / "one"),
        EngineConfig(budget_per_host=1),
    ).run(seeds)
    dup = CrawlEngine(
        spark, pages, model, str(tmp_path / "two"),
        EngineConfig(budget_per_host=1),
    ).run([seeds[0], seeds[0].rstrip("/")])
    assert _summary(dup) == _summary(base)


def test_expire_snapshots_semantics(spark, tmp_path):
    """Iceberg expireSnapshots parity: old committed rounds drop, the
    newest keep_last survive, orphan version dirs / tmp manifests in
    retained rounds are GC'd, and an uncommitted round NEWER than the
    newest commit is left alone (concurrent writer mid-commit)."""
    import json
    import os

    ck = CrawlCheckpoint(spark, str(tmp_path / "ck"))
    df = spark.range(3).select(
        F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
        F.lit(None).cast("string").alias("form_params"),
    )
    m = df.select(F.lit(0).alias("partition_id"), F.lit(1).alias("rows"))
    hs = spark.createDataFrame([("h", 1, 1)], "host string, seq long, fetched long")
    seen = df.select(F.xxhash64("url").alias("url_hash"))
    for rnd in (1, 2, 3, 4):
        ck.write(rnd, df, seen, df.limit(0), m, hs)
    # plant crash debris in a retained round: an orphan version dir
    # (parquet written, manifest never flipped) + a stale tmp manifest
    orphan = tmp_path / "ck" / "round=4" / "v=9"
    orphan.mkdir()
    (tmp_path / "ck" / "round=4" / "_MANIFEST.json.tmp").write_text("{}")
    # and an uncommitted round NEWER than the newest commit
    (tmp_path / "ck" / "round=5" / "v=1").mkdir(parents=True)

    stats = ck.expire_snapshots(keep_last=2)
    assert stats == {"rounds_expired": 2, "orphans_removed": 2}
    assert ck.committed_rounds() == [3, 4]
    assert not orphan.exists()
    assert not (tmp_path / "ck" / "round=4" / "_MANIFEST.json.tmp").exists()
    assert (tmp_path / "ck" / "round=5").exists()  # mid-commit writer
    # the live version is untouched and still loads
    snap = ck.latest()
    assert snap.round == 4 and snap.frontier.count() == 3
    # idempotent + guards
    assert ck.expire_snapshots(keep_last=2) == {
        "rounds_expired": 0, "orphans_removed": 0,
    }
    with pytest.raises(ValueError, match="keep_last"):
        ck.expire_snapshots(keep_last=0)


def test_resume_after_retention(spark, site, tmp_path):
    """keep_snapshots=1 retains only the newest committed round at
    every commit — and the crawl still resumes losslessly from it."""
    import os

    model, pages, seeds = site
    base = CrawlEngine(
        spark, pages, model, str(tmp_path / "base"),
        EngineConfig(budget_per_host=1),
    ).run(seeds)
    want = _summary(base)

    crash_cfg = EngineConfig(
        budget_per_host=1, checkpoint_every=1, crash_at_round=4,
        keep_snapshots=1,
    )
    CrawlEngine(spark, pages, model, str(tmp_path / "ret"), crash_cfg).run(
        seeds
    )
    ck_root = tmp_path / "ret" / "checkpoints"
    rounds = [n for n in os.listdir(ck_root) if n.startswith("round=")]
    assert len(rounds) == 1, rounds  # retention held at every commit

    resumed = CrawlEngine(
        spark, pages, model, str(tmp_path / "ret"),
        EngineConfig(budget_per_host=1, checkpoint_every=1, keep_snapshots=1),
    ).run(resume=True)
    assert _summary(resumed) == want
