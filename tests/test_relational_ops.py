"""Unit tests for the distributed graph/relational operators backing the
new __spark_entry__ queries: BFS depth assignment (SURVEY C10 at data
scale) and the vectorized LSH bucket UDF (ANN scale path)."""

from pyspark.sql import functions as F


def test_bfs_depths_chain_with_cycle(spark):
    # 0→1→2→3→0 cycle plus a branch 1→4; node 9 unreachable
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (1, 4), (9, 9)], "src long, dst long"
    )
    from smart_crawler_spark.operators.relational import bfs_depths

    got = {
        r["node"]: r["depth"]
        for r in bfs_depths(edges, start=0, max_depth=6).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2}


def test_bfs_depths_bounded(spark):
    # a 10-chain cut at max_depth=3
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    from smart_crawler_spark.operators.relational import bfs_depths

    got = bfs_depths(edges, start=0, max_depth=3)
    assert got.count() == 4
    assert got.agg(F.max("depth")).first()[0] == 3


def test_band_buckets_udf_matches_expression(spark):
    """The batched pandas-UDF bucket keys must equal the per-band
    expression form (same planes, same packing) away from the sign
    boundary."""
    import numpy as np

    from smart_crawler_spark.operators.simsearch import (
        band_buckets_udf,
        hyperplanes,
        simhash_bits,
    )

    rng = np.random.Generator(np.random.PCG64(3))
    vecs = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(50)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    bands, bits = 3, 5
    udf_rows = df.select(
        "vec_id", band_buckets_udf(16, bands, bits)("embedding").alias("bk")
    ).collect()
    expr_cols = [
        simhash_bits(F.col("embedding"), hyperplanes(16, bits, seed=101 + b)).alias(
            f"b{b}"
        )
        for b in range(bands)
    ]
    expr_rows = df.select("vec_id", *expr_cols).collect()
    exp = {r["vec_id"]: [r[f"b{b}"] for b in range(bands)] for r in expr_rows}
    for r in udf_rows:
        assert list(r["bk"]) == exp[r["vec_id"]], r["vec_id"]


def test_range_join_matches_theta_join(spark):
    """Bucketized interval join == the brute-force theta join, including
    inclusive endpoints and intervals spanning many bins."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=37 * i)) for i in range(200)],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            # spans ~23 bins at bin_width=60
            (0, base, base + dt.timedelta(seconds=1357)),
            # single-bin interval
            (1, base + dt.timedelta(seconds=500),
             base + dt.timedelta(seconds=530)),
            # endpoints exactly on point timestamps (37*10, 37*20)
            (2, base + dt.timedelta(seconds=370),
             base + dt.timedelta(seconds=740)),
            # empty interval far away
            (3, base + dt.timedelta(days=2),
             base + dt.timedelta(days=2, seconds=10)),
        ],
        "iid long, lo timestamp, hi timestamp",
    )
    from smart_crawler_spark.operators.relational import range_join

    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "ts", "lo", "hi", bin_width_s=60
        ).collect()
    }
    brute = {
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi")))
        .collect()
    }
    assert got == brute and len(got) > 0
    # inclusive endpoints really present
    assert (10, 2) in got and (20, 2) in got
    # no interval-3 matches
    assert not any(i == 3 for _, i in got)


def test_range_join_span_guard_pathological_intervals(spark):
    """A days-long interval over 300 s bins must NOT explode into
    thousands of bin rows: the multi-resolution index caps every
    interval at ~max_bins_per_interval bins (coarser level), and the
    join output is still exactly the theta-join answer."""
    import datetime as dt

    from smart_crawler_spark.operators.relational import (
        _binned_intervals,
        range_join,
    )

    base = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=29 * i)) for i in range(300)],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            # pathological: 5-day span = 1440 bins at 300 s single-level
            (0, base, base + dt.timedelta(days=5)),
            # 3-week span = 6048 bins single-level
            (1, base + dt.timedelta(days=1), base + dt.timedelta(days=22)),
            # normal spans
            (2, base + dt.timedelta(hours=3),
             base + dt.timedelta(hours=3, minutes=7)),
            (3, base + dt.timedelta(days=4),
             base + dt.timedelta(days=4, seconds=1)),
        ],
        "iid long, lo timestamp, hi timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "ts", "lo", "hi", bin_width_s=300,
            max_bins_per_interval=64,
        ).collect()
    }
    brute = {
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi")))
        .collect()
    }
    assert got == brute and len(got) > 100

    # the guard itself: no interval explodes past max_bins+2 bin rows
    per_iid = {
        r["iid"]: r["n"]
        for r in _binned_intervals(intervals, "lo", "hi", 300, 64)
        .groupBy("iid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(n <= 66 for n in per_iid.values()), per_iid
    # normal intervals stay at fine resolution (level 0, few bins)
    assert per_iid[2] <= 3 and per_iid[3] <= 2


def test_range_join_span_guard_property(spark):
    """Randomized spans from seconds to months: bin-row explosion stays
    bounded and output == theta join."""
    import datetime as dt
    import random

    from smart_crawler_spark.operators.relational import (
        _binned_intervals,
        range_join,
    )

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    spans = [rng.randrange(0, 90 * 86400) for _ in range(40)]
    rows = [
        (k, base + dt.timedelta(seconds=rng.randrange(0, 30 * 86400)))
        for k in range(40)
    ]
    intervals = spark.createDataFrame(
        [(k, lo, lo + dt.timedelta(seconds=spans[k])) for k, lo in rows],
        "iid long, lo timestamp, hi timestamp",
    )
    points = spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=rng.randrange(0, 120 * 86400)))
            for i in range(400)
        ],
        "pid long, ts timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "ts", "lo", "hi", bin_width_s=300,
            max_bins_per_interval=32,
        ).collect()
    }
    brute = {
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi")))
        .collect()
    }
    assert got == brute
    max_bins = (
        _binned_intervals(intervals, "lo", "hi", 300, 32)
        .groupBy("iid").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n")).first()[0]
    )
    assert max_bins <= 34, max_bins


def test_stratified_sample_deterministic_and_stratified(spark):
    """Same rows kept across runs and partitionings; per-stratum
    fractions honored approximately; unknown strata dropped."""
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "k long, s string")
    from smart_crawler_spark.operators.relational import stratified_sample

    fr = {"a": 0.5, "b": 0.1}
    keep1 = {r["k"] for r in stratified_sample(df, "s", "k", fr).collect()}
    keep2 = {
        r["k"]
        for r in stratified_sample(df.repartition(7, "s"), "s", "k", fr).collect()
    }
    assert keep1 == keep2  # layout-independent
    n_a = sum(1 for k in keep1 if k % 3 == 0)
    n_b = sum(1 for k in keep1 if k % 3 == 1)
    assert not any(k % 3 == 2 for k in keep1)  # stratum 'c' dropped
    assert abs(n_a / 1000 - 0.5) < 0.05
    assert abs(n_b / 1000 - 0.1) < 0.03


def test_asof_join_returns_whole_latest_row_with_nulls(spark):
    """The as-of contract is "the latest right row's values, NULLS
    INCLUDED" — a per-column last(ignorenulls) would stitch fields from
    different right rows."""
    from smart_crawler_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [("k", 3), ("k", 1)], "key string, lts int"
    )
    right = spark.createDataFrame(
        [("k", 1, 100, None), ("k", 2, None, 5)],
        "key string, rts int, price int, qty int",
    )
    got = {
        r["lts"]: (r["price"], r["qty"])
        for r in asof_join(
            left, right, "key", "lts", "rts", ["price", "qty"]
        ).collect()
    }
    # lts=3 sees the ts=2 row AS IS (price null), never price=100/qty=5
    assert got[3] == (None, 5)
    assert got[1] == (100, None)
