"""Frontier unit tests mirroring the reference's CrawlQueueTest:
dedup equivalences, priority order across classes, politeness budgets,
bloom prefilter ≡ exact layer."""

from pyspark.sql import functions as F

from smart_crawler_spark.frontier.canonical import url_seen_key
from smart_crawler_spark.frontier.dedup import BloomConfig, SeenFilter, dedup_new_urls
from smart_crawler_spark.frontier.queue import pick_batch, priority_rank


def _frontier(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, host string, page_class string, class_depth int,"
        " class_name string, form_params string",
    )


def test_priority_order_classes_then_url(spark):
    # CrawlQueueTest.java:178-215 — shallowest class first, then name, then URL
    rows = [
        ("http://h/d9", "h", "detail", 2, "detail", None),
        ("http://h/a1", "h", "about", 1, "about", None),
        ("http://h/d1", "h", "detail", 2, "detail", None),
        ("http://h/", "h", "home", 0, "home", None),
        ("http://h/b2", "h", "dir0", 1, "dir0", None),
    ]
    ranked = priority_rank(_frontier(spark, rows)).orderBy("rank").collect()
    assert [r["url"] for r in ranked] == [
        "http://h/",
        "http://h/a1",
        "http://h/b2",
        "http://h/d1",
        "http://h/d9",
    ]


def test_pick_batch_per_host_budget(spark):
    rows = [
        (f"http://{h}/p{i}", h, "detail", 2, "detail", None)
        for h in ("a.test", "b.test")
        for i in range(5)
    ]
    batch = pick_batch(_frontier(spark, rows), budget_per_host=2)
    got = sorted((r["host"], r["url"]) for r in batch.collect())
    assert got == [
        ("a.test", "http://a.test/p0"),
        ("a.test", "http://a.test/p1"),
        ("b.test", "http://b.test/p0"),
        ("b.test", "http://b.test/p1"),
    ]


def test_pick_batch_salted_matches_unsalted(spark):
    rows = [
        (f"http://hot.test/p{i:03d}", "hot.test", "detail", 2, "detail", None)
        for i in range(50)
    ] + [("http://cold.test/x", "cold.test", "home", 0, "home", None)]
    plain = pick_batch(_frontier(spark, rows), budget_per_host=3)
    salted = pick_batch(_frontier(spark, rows), budget_per_host=3, salt_buckets=8)
    assert sorted(r["url"] for r in plain.collect()) == sorted(
        r["url"] for r in salted.collect()
    )


def test_dedup_equivalences(spark):
    # CrawlQueueTest.java:89-116 — slash/fragment equivalent, query distinct
    seen_urls = ["http://h.test/", "http://h.test/a"]
    seen = spark.createDataFrame([(u,) for u in seen_urls], "url string").select(
        url_seen_key(F.col("url")).alias("url_hash")
    )
    cand_urls = [
        "http://h.test",          # == seen (trailing slash)
        "http://h.test/a#frag",   # == seen (fragment)
        "http://h.test/a?k=1",    # new (query distinguishes)
        "http://h.test/b",        # new
    ]
    cand = spark.createDataFrame([(u,) for u in cand_urls], "url string").withColumn(
        "url_hash", url_seen_key(F.col("url"))
    )
    new = dedup_new_urls(cand, seen)
    assert sorted(r["url"] for r in new.collect()) == [
        "http://h.test/a?k=1",
        "http://h.test/b",
    ]


def test_seen_filter_bloom_equals_exact(spark):
    cfg = BloomConfig(shards=8, bits_per_shard=1 << 14, num_hashes=4)
    exact = SeenFilter(spark, cfg, use_bloom=False)
    bloom = SeenFilter(spark, cfg, use_bloom=True)
    urls1 = [(f"http://s{i % 3}.test/p{i}",) for i in range(200)]
    batch1 = spark.createDataFrame(urls1, "url string").withColumn(
        "url_hash", url_seen_key(F.col("url"))
    )
    for f in (exact, bloom):
        f.add(batch1.select("url_hash"))
    # overlapping batch: 100 old + 100 new
    urls2 = [(f"http://s{i % 3}.test/p{i}",) for i in range(100, 300)]
    batch2 = spark.createDataFrame(urls2, "url string").withColumn(
        "url_hash", url_seen_key(F.col("url"))
    )
    got_exact = sorted(r["url"] for r in exact.filter_new(batch2).collect())
    got_bloom = sorted(r["url"] for r in bloom.filter_new(batch2).collect())
    assert got_exact == got_bloom
    assert len(got_exact) == 100 and all("/p2" in u or "/p1" in u for u in got_exact)
    # force the sharded-cogroup probe layout (the 10^10-key path where
    # the bitmaps don't fit a broadcast) — must agree with broadcast
    cogroup = SeenFilter(spark, cfg, use_bloom=True)
    cogroup.BROADCAST_BLOOM_MAX_BYTES = 0
    cogroup.add(batch1.select("url_hash"))
    got_cg = sorted(r["url"] for r in cogroup.filter_new(batch2).collect())
    assert got_cg == got_exact


def test_seen_filter_remove_exact_and_cuckoo(spark):
    """remove() (recrawl expiry): removed keys become 'new' again on
    both the exact path and cuckoo bitmaps (real fingerprint deletes),
    surviving keys stay seen, and a remove->add roundtrip restores the
    original behavior. Bloom-kind bitmaps rebuild from the surviving
    table and must agree too."""
    cfgs = [
        BloomConfig(shards=4, kind="cuckoo", cuckoo_buckets=1 << 8),
        BloomConfig(shards=4, bits_per_shard=1 << 14, num_hashes=4),
    ]
    keys = spark.createDataFrame(
        [(f"http://h.test/p{i}",) for i in range(120)], "url string"
    ).withColumn("url_hash", url_seen_key(F.col("url")))
    gone = keys.filter(F.col("url").rlike("p[0-9]?[02468]$"))
    probe = keys  # every key
    for cfg in cfgs:
        for use_bloom in (False, True):
            f = SeenFilter(spark, cfg, use_bloom=use_bloom)
            f.add(keys.select("url_hash"))
            assert f.filter_new(probe).count() == 0
            f.remove(gone.select("url_hash"))
            got = sorted(r["url"] for r in f.filter_new(probe).collect())
            want = sorted(r["url"] for r in gone.collect())
            assert got == want, (cfg.kind, use_bloom)
            # re-add (the recrawl re-enqueue): nothing is new again
            f.add(gone.select("url_hash"))
            assert f.filter_new(probe).count() == 0, (cfg.kind, use_bloom)
            # removing keys never added is a no-op on the exact set
            other = spark.createDataFrame(
                [("http://x.test/q1",)], "url string"
            ).withColumn("url_hash", url_seen_key(F.col("url")))
            if cfg.kind != "cuckoo":  # cuckoo delete requires prior add
                f.remove(other.select("url_hash"))
                assert f.filter_new(probe).count() == 0


def test_politeness_budget_math():
    from smart_crawler_spark.frontier.queue import politeness_budget

    # reference defaults: 2000ms + U[0,1000) => ~0.4 URLs/s/host
    assert politeness_budget(60_000, 2000, 1000) == 24
    assert politeness_budget(60_000, 0, 0) == 1 << 30  # tests run wait=0
    assert politeness_budget(1000, 2000) == 1  # at least one per round


def test_engine_config_politeness_budget():
    from smart_crawler_spark.crawler.engine import EngineConfig

    cfg = EngineConfig(budget_per_host=1 << 30, wait_ms=2000,
                       random_pause_ms=1000, round_ms=60_000)
    assert cfg.effective_budget() == 24
    assert EngineConfig(budget_per_host=5).effective_budget() == 5


def test_seen_filter_lazy_activation(spark):
    """lazy=True: add() maintains no bitmaps (zero bloom cost on the
    exact path); activate_blooms() builds once from the seen table and
    the bloom path then equals the exact path exactly."""
    from pyspark.sql import functions as F

    from smart_crawler_spark.frontier.dedup import BloomConfig, SeenFilter

    sf = SeenFilter(
        spark, BloomConfig(shards=8), use_bloom=True, lazy=True
    )
    seen = spark.range(0, 5000).select(F.xxhash64("id").alias("url_hash"))
    sf.add(seen)
    sf.materialize()
    assert sf.blooms is None  # no maintenance paid while lazy
    cand = spark.range(2500, 10_000).select(
        F.col("id").alias("cand_id"), F.xxhash64("id").alias("url_hash")
    )
    want = {r["cand_id"] for r in sf.filter_new(cand, prefer_bloom=False).collect()}
    sf.activate_blooms()
    assert sf.blooms is not None and not sf.lazy
    got = {r["cand_id"] for r in sf.filter_new(cand, prefer_bloom=True).collect()}
    assert got == want
    # post-activation adds maintain incrementally again
    sf.add(cand.select("url_hash"))
    assert sf.filter_new(cand).count() == 0


def test_cogroup_probe_missing_bitmap_is_safe(spark):
    """A shard with no bitmap must fall through to the exact anti-join,
    never answer 'definitely new' — a missing bitmap that skipped the
    join would be a false negative (re-crawled page). Forced onto the
    cogroup layout, with one shard's bitmap deleted."""
    from pyspark.sql import functions as F

    from smart_crawler_spark.frontier.dedup import BloomConfig, SeenFilter

    sf = SeenFilter(spark, BloomConfig(shards=8), use_bloom=True)
    sf.BROADCAST_BLOOM_MAX_BYTES = 1  # force the cogroup probe
    seen = spark.range(0, 20_000).select(F.xxhash64("id").alias("url_hash"))
    sf.add(seen)
    sf.materialize()
    sf.blooms = sf.blooms.filter(F.col("shard") != 3)
    cand = spark.range(10_000, 30_000).select(
        F.col("id").alias("cand_id"), F.xxhash64("id").alias("url_hash")
    )
    got = {r["cand_id"] for r in sf.filter_new(cand).collect()}
    assert got == set(range(20_000, 30_000))


def test_broadcast_probe_missing_bitmap_is_safe(spark):
    """Same missing-bitmap contract on the BROADCAST layout: a shard
    absent from the blooms table probes as 'maybe seen' (exact join
    decides) — the dense matrix must not answer 'definitely new' from
    an all-zero row."""
    from pyspark.sql import functions as F

    from smart_crawler_spark.frontier.dedup import BloomConfig, SeenFilter

    sf = SeenFilter(spark, BloomConfig(shards=8), use_bloom=True)
    seen = spark.range(0, 20_000).select(F.xxhash64("id").alias("url_hash"))
    sf.add(seen)
    sf.materialize()
    sf.blooms = sf.blooms.filter(F.col("shard") != 3)
    sf._dense_cache = None  # rebuild the dense matrix from the cut table
    cand = spark.range(10_000, 30_000).select(
        F.col("id").alias("cand_id"), F.xxhash64("id").alias("url_hash")
    )
    got = {r["cand_id"] for r in sf.filter_new(cand).collect()}
    assert got == set(range(20_000, 30_000))


def test_ranged_rank_matches_window_rank(spark):
    """ranged_priority_rank (the giant-budget distributed selection)
    must assign the IDENTICAL per-host rank as the window path on a
    skewed multi-host frontier with form-param rows, including nulls-
    first ordering and cross-partition offset arithmetic."""
    import random

    from smart_crawler_spark.frontier.queue import ranged_priority_rank

    rng = random.Random(7)
    rows = []
    for i in range(4000):
        host = "hot.test" if rng.random() < 0.9 else f"cold{rng.randint(0, 5)}"
        depth = rng.randint(0, 2)
        fp = None if rng.random() < 0.5 else f"k={rng.randint(0, 3)}"
        rows.append(
            (f"http://{host}/p{rng.randint(0, 10**6):07d}-{i}", host,
             "detail", depth, f"class{depth}", fp)
        )
    df = _frontier(spark, rows).repartition(13).localCheckpoint()
    key = ["url", "host", "form_params"]
    want = {tuple(r[k] for k in key): r["rank"]
            for r in priority_rank(df).collect()}
    got = {tuple(r[k] for k in key): r["rank"]
           for r in ranged_priority_rank(df, num_partitions=8).collect()}
    assert got == want


def test_pick_batch_giant_budget_matches_window_path(spark):
    """Above RANGED_BUDGET_THRESHOLD pick_batch switches to the ranged
    path; the selected batch must be identical to the window path's."""
    from smart_crawler_spark.frontier import queue as qmod

    rows = [
        (f"http://hot.test/p{i:05d}", "hot.test", "detail", 2, "detail", None)
        for i in range(500)
    ] + [
        (f"http://cold{i % 3}/x{i:03d}", f"cold{i % 3}", "home", 0, "home",
         None)
        for i in range(90)
    ]
    df = _frontier(spark, rows).localCheckpoint()
    plain = pick_batch(df, budget_per_host=40)
    old = qmod.RANGED_BUDGET_THRESHOLD
    qmod.RANGED_BUDGET_THRESHOLD = 10  # force the giant-budget path
    try:
        ranged = pick_batch(df, budget_per_host=40)
    finally:
        qmod.RANGED_BUDGET_THRESHOLD = old
    assert sorted(r["url"] for r in plain.collect()) == sorted(
        r["url"] for r in ranged.collect()
    )


def test_idn_normalize_host_paths_and_failures(spark):
    """ASCII fast path lowercases natively; IDN hosts punycode; a host
    the codec rejects keeps its lowercased original; null rides
    through."""
    from smart_crawler_spark.frontier.canonical import idn_normalize_host

    rows = [
        (0, "Plain.Test"),
        (1, "MÜNCHEN.example"),
        (2, "x" * 80 + "é.test"),  # overlong label -> ToASCII fails
        (3, None),
    ]
    df = spark.createDataFrame(rows, "i int, host string")
    got = {r["i"]: r["host_idn"] for r in idn_normalize_host(df).collect()}
    assert got[0] == "plain.test"
    assert got[1] == "xn--mnchen-3ya.example"
    assert got[2] == "x" * 80 + "é.test"
    assert got[3] is None
