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


def test_domain_mix_shares_and_determinism(spark):
    """Downsampling-only mixing: the binding domain keeps everything,
    over-represented domains thin toward the target shares, the kept
    set is layout-independent, and unlisted domains drop."""
    from smart_crawler_spark.operators.relational import domain_mix

    rows = (
        [(i, "en") for i in range(6000)]
        + [(10000 + i, "de") for i in range(1000)]
        + [(20000 + i, "junk") for i in range(500)]
    )
    df = spark.createDataFrame(rows, "id long, dom string")
    targets = {"en": 0.5, "de": 0.5}
    out = domain_mix(df, "dom", "id", targets).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["dom"], set()).add(r["id"])
    # de is binding (1000/0.5 = 2000 < 6000/0.5): kept fully
    assert len(by_dom["de"]) == 1000
    # en thinned to ~1000 (p = 1/6): hash draw, so ±5% slack
    assert 900 <= len(by_dom["en"]) <= 1100
    assert "junk" not in by_dom
    # layout independence: same kept set after a repartition
    out2 = domain_mix(df.repartition(7, "id"), "dom", "id", targets)
    ids2 = {r["id"] for r in out2.collect()}
    assert ids2 == by_dom["en"] | by_dom["de"]


def test_deterministic_shuffle_matches_global_sort(spark):
    """The two-phase prefix-sum order must equal the specification
    order (global sort by the md5 draw), with round-robin shards, on
    any input layout."""
    from smart_crawler_spark.operators.relational import (
        deterministic_shuffle,
    )
    from smart_crawler_spark.operators.textops import md5_hash32

    df = spark.createDataFrame(
        [(i,) for i in range(777)], "id long"
    ).repartition(13)
    out = deterministic_shuffle(df, "id", n_shards=5, n_buckets=16)
    got = {r["id"]: (r["pos"], r["shard"]) for r in out.collect()}
    draws = {
        r["id"]: r["h"]
        for r in df.select("id", md5_hash32("id").alias("h")).collect()
    }
    want_order = sorted(draws, key=lambda i: (draws[i], i))
    assert len(got) == 777
    for pos, i in enumerate(want_order):
        assert got[i] == (pos, pos % 5)


def test_deterministic_shuffle_window_partitioned_by_bucket(spark):
    """The corpus-ranking window must partition by the draw bucket —
    the only unpartitioned window allowed in the plan is the tiny
    bucket-offset prefix sum (n_buckets rows)."""
    from smart_crawler_spark.operators.relational import (
        deterministic_shuffle,
    )

    df = spark.range(1000).withColumnRenamed("id", "k")
    plan = deterministic_shuffle(df, "k", n_shards=4)._jdf.queryExecution(
    ).executedPlan().toString()
    # the ranked window carries the bucket in its partition spec
    windows = [l for l in plan.splitlines() if "Window" in l]
    assert any("_b" in w for w in windows)


def test_group_sample_k_exact_deterministic_and_group_limited(spark):
    """Exactly min(k, group size) rows per group, identical on any
    layout, and the plan runs the rank filter as WindowGroupLimit
    (map-side partial limits, not a full-group sort+filter)."""
    from smart_crawler_spark.operators.relational import group_sample_k

    rows = [(g, g * 100 + i) for g in range(20) for i in range(g % 5 + 1)]
    df = spark.createDataFrame(rows, "grp long, id long")
    out = group_sample_k(df, "grp", "id", k=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["grp"], []).append((r["rk"], r["id"]))
    for g in range(20):
        assert len(got[g]) == min(3, g % 5 + 1)
        assert sorted(rk for rk, _ in got[g]) == list(
            range(1, len(got[g]) + 1)
        )
    out2 = group_sample_k(df.repartition(9, "id"), "grp", "id", k=3)
    assert {(r["grp"], r["id"]) for r in out2.collect()} == {
        (g, i) for g, pairs in got.items() for _, i in pairs
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_new_sampling_ops_match_bruteforce_property(spark):
    """Randomized differential sweep: domain_mix, deterministic_shuffle
    and group_sample_k must equal the brute-force Python statement of
    their specs on arbitrary shapes (domain skew, bucket counts, group
    sizes)."""
    import hashlib
    import random

    from smart_crawler_spark.operators.relational import (
        deterministic_shuffle,
        domain_mix,
        group_sample_k,
    )

    def u32(key):
        return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)

    rng = random.Random(42)
    for trial in range(4):
        doms = [f"d{j}" for j in range(rng.randint(2, 6))]
        rows = [
            (i, rng.choice(doms))
            for i in range(rng.randint(50, 400))
        ]
        df = spark.createDataFrame(rows, "id long, dom string")

        # --- domain_mix vs brute force
        targets = {d: rng.choice([0.1, 0.2, 0.4]) for d in doms[:-1]}
        got = {r["id"] for r in domain_mix(df, "dom", "id", targets).collect()}
        counts = {d: sum(1 for _, x in rows if x == d) for d in doms}
        cap = min(
            counts[d] / t for d, t in targets.items() if counts[d] > 0
        )
        want = {
            i
            for i, d in rows
            if d in targets
            and u32(i) / 2**32 < targets[d] * cap / counts[d]
        }
        assert got == want, f"domain_mix trial {trial}"

        # --- deterministic_shuffle vs global sort spec
        nb = rng.choice([1, 5, 16])
        ns = rng.choice([1, 4, 7])
        out = deterministic_shuffle(df, "id", n_shards=ns, n_buckets=nb)
        got_pos = {r["id"]: (r["pos"], r["shard"]) for r in out.collect()}
        order = sorted((i for i, _ in rows), key=lambda i: (u32(i), i))
        assert got_pos == {
            i: (p, p % ns) for p, i in enumerate(order)
        }, f"shuffle trial {trial} nb={nb}"

        # --- group_sample_k vs brute force
        k = rng.randint(1, 4)
        got_s = {
            (r["dom"], r["id"])
            for r in group_sample_k(df, "dom", "id", k).collect()
        }
        want_s = set()
        for d in doms:
            members = sorted(
                (i for i, x in rows if x == d), key=lambda i: (u32(i), i)
            )
            want_s |= {(d, i) for i in members[:k]}
        assert got_s == want_s, f"group_sample trial {trial} k={k}"


def test_snapshot_diff(spark):
    from smart_crawler_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "k long, v string, n int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, "c", 30), (5, "e", 50)],
        "k long, v string, n int",
    )
    got = {
        r["k"]: r["change"]
        for r in snapshot_diff(old, new, ["k"], ["v", "n"]).collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",      # v differs
        3: "changed",      # null -> 30 must be changed (null-safe)
        4: "removed",
        5: "added",
    }
    plan = (
        snapshot_diff(old, new, ["k"], ["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "FullOuter" in plan and "CartesianProduct" not in plan, plan


def test_weighted_sample(spark):
    from smart_crawler_spark.operators.relational import weighted_sample

    df = spark.createDataFrame(
        [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(2000)]
        + [(9001, 0.0), (9002, -3.0)],
        "k long, w double",
    )
    out = weighted_sample(df, "w", "k", target_fraction=1.0)
    rows = out.collect()
    kept = {r["k"] for r in rows}
    assert 9001 not in kept and 9002 not in kept
    # w=10 is max -> p=1.0: every even key survives
    assert all(i in kept for i in range(0, 2000, 2))
    # w=1 -> p=0.1: binomial(1000, 0.1), 5-sigma band
    n_light = sum(1 for k in kept if k < 2000 and k % 2 == 1)
    assert 50 < n_light < 150, n_light
    # deterministic: identical output on a re-run
    assert {r["k"] for r in weighted_sample(df, "w", "k").collect()} == kept


def test_scd2_history(spark):
    from smart_crawler_spark.operators.relational import scd2_history

    rows = [
        # key 1: a,a,b,b,a -> three intervals
        (1, 0, "a"), (1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "a"),
        # key 2: null -> x (null-safe change must open a new interval)
        (2, 0, None), (2, 1, "x"),
        # key 3: constant -> one open-ended interval
        (3, 0, "c"), (3, 1, "c"),
    ]
    df = spark.createDataFrame(rows, "k long, ver long, v string")
    got = sorted(
        (
            (r["k"], r["v"], r["valid_from"], r["valid_to"])
            for r in scd2_history(df, ["k"], "ver", ["v"]).collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    assert got == [
        (1, "a", 0, 2), (1, "b", 2, 4), (1, "a", 4, None),
        (2, None, 0, 1), (2, "x", 1, None),
        (3, "c", 0, None),
    ]


def test_scd2_history_random_sweep(spark):
    """Differential sweep: random per-key value histories vs a
    pure-Python gaps-and-islands spec (null-safe change detection,
    open-ended last interval)."""
    import random

    from smart_crawler_spark.operators.relational import scd2_history

    rng = random.Random(1234)
    rows = []
    for key in range(40):
        vals = [
            rng.choice([None, "a", "b", "c"])
            for _ in range(rng.randint(1, 9))
        ]
        rows.extend((key, ver, v) for ver, v in enumerate(vals))

    def spec(rows):
        out = []
        by_key = {}
        for k, ver, v in sorted(rows):
            by_key.setdefault(k, []).append(v)
        for k, vals in by_key.items():
            start = 0
            for i in range(1, len(vals) + 1):
                if i == len(vals) or vals[i] != vals[i - 1]:
                    out.append(
                        (k, vals[start], start,
                         None if i == len(vals) else i)
                    )
                    if i < len(vals):
                        start = i
        return sorted(out, key=lambda t: (t[0], t[2]))

    df = spark.createDataFrame(rows, "k long, ver long, v string")
    got = sorted(
        (
            (r["k"], r["v"], r["valid_from"], r["valid_to"])
            for r in scd2_history(df, ["k"], "ver", ["v"]).collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    assert got == spec(rows)


def test_compaction_plan_invariants(spark):
    """Bin-pack invariants: every file appears exactly once, healthy
    files (>= target) pass through untouched as group -1, no rewrite
    group mixes partitions, and every group except each partition's
    last holds at least the target."""
    from smart_crawler_spark.operators.relational import compaction_plan

    rows = [
        ("a", i, [40, 100, 90, 300, 10, 70, 130, 50][i]) for i in range(8)
    ] + [("b", i, 60) for i in range(3)]
    files = spark.createDataFrame(
        rows, "part string, file_id int, size long"
    )
    plan = compaction_plan(
        files, "part", "size", "file_id", target_bytes=128
    ).collect()

    assert len(plan) == len(rows)
    assert {(r["part"], r["file"]) for r in plan} == {
        (p, f) for p, f, _ in rows
    }
    # healthy files: a/3 (300) and a/6 (130)
    assert {
        (r["part"], r["file"]) for r in plan if r["group_no"] == -1
    } == {("a", 3), ("a", 6)}
    # next-fit over a's small files (40,100,90,10,70,50 in file order):
    # exclusive cumsum 0,40,140,230,240,310 // 128 -> 0,0,1,1,1,2
    got_a = {
        r["file"]: r["group_no"]
        for r in plan
        if r["part"] == "a" and r["group_no"] >= 0
    }
    assert got_a == {0: 0, 1: 0, 2: 1, 4: 1, 5: 1, 7: 2}
    # The floor(exclusive-prefix-sum / target) rule does NOT promise
    # that every non-final group reaches target bytes — a file that
    # straddles a group boundary is assigned to the group its start
    # offset falls in, so a non-final group can total below target.
    # What the rule DOES promise (and the random sweep below pins
    # exactly): each group's first file starts < target past the
    # previous boundary, i.e. cumulative start offsets within a group
    # g all lie in [g*target, (g+1)*target).
    starts = {}
    for fid in sorted(f for f, _ in got_a.items()):
        prior = sum(
            s
            for f2, s in [(0, 40), (1, 100), (2, 90), (4, 10), (5, 70), (7, 50)]
            if f2 < fid
        )
        starts[fid] = prior
    for fid, g in got_a.items():
        assert g * 128 <= starts[fid] < (g + 1) * 128, (fid, g, starts[fid])


def test_compaction_plan_subtarget_nonfinal_group(spark):
    """Counterexample ledger (from the round-4 audit): sizes
    [115, 26, 115, 26] at target 128 pack to groups [0, 0, 1, 2] —
    group 1 holds only 115 bytes yet is not the partition's last.
    Pins that the positional floor rule, not a >=target fill
    guarantee, is the operator's contract."""
    from smart_crawler_spark.operators.relational import compaction_plan

    df = spark.createDataFrame(
        [("p", 0, 115), ("p", 1, 26), ("p", 2, 115), ("p", 3, 26)],
        "part string, file_id int, size long",
    )
    plan = {
        r["file"]: r["group_no"]
        for r in compaction_plan(
            df, "part", "size", "file_id", target_bytes=128
        ).collect()
    }
    assert plan == {0: 0, 1: 0, 2: 1, 3: 2}
    # group 1's total (115) is below target and group 1 is non-final:
    # expected under the positional rule.
    assert 115 < 128 and max(plan.values()) == 2


def test_proportional_allocation_exact_total_and_ties(spark):
    """sum(alloc) == total exactly; floor shares never lose a slot;
    remainder ties break by key ascending; zero-weight keys get 0."""
    from smart_crawler_spark.operators.relational import (
        proportional_allocation,
    )

    # weights 3,3,3,1 with total 7 over S=10: floors 2,2,2,0 (sum 6),
    # one spare slot; remainders 1,1,1,7 -> key 'd' wins the spare
    df = spark.createDataFrame(
        [("a", 3), ("b", 3), ("c", 3), ("d", 1)], "key string, w long"
    )
    got = {
        (r["key"], r["alloc"])
        for r in proportional_allocation(df, "key", "w", total=7).collect()
    }
    assert got == {("a", 2), ("b", 2), ("c", 2), ("d", 1)}

    # equal remainders: spare goes to the lexicographically first keys
    df2 = spark.createDataFrame(
        [("x", 1), ("y", 1), ("z", 1)], "key string, w long"
    )
    got2 = {
        (r["key"], r["alloc"])
        for r in proportional_allocation(df2, "key", "w", total=5).collect()
    }
    assert got2 == {("x", 2), ("y", 2), ("z", 1)}
    for total in (0, 1, 99):
        rows = proportional_allocation(df, "key", "w", total=total).collect()
        assert sum(r["alloc"] for r in rows) == total

    # zero weight mass (empty input or all-zero weights) must fail
    # loudly instead of emitting null allocs
    import pytest

    empty = spark.createDataFrame([], "key string, w long")
    zeros = spark.createDataFrame([("a", 0), ("b", 0)], "key string, w long")
    for bad in (empty, zeros):
        with pytest.raises(ValueError, match="sum\\(weights\\) is 0"):
            proportional_allocation(bad, "key", "w", total=5)


def test_compaction_plan_random_sweep(spark):
    """Differential sweep: random ledgers vs a pure-Python next-fit
    reference packer (exclusive prefix sum // target within partition,
    pass-through for healthy files)."""
    import random

    from smart_crawler_spark.operators.relational import compaction_plan

    rng = random.Random(1234)
    for trial in range(8):
        target = rng.choice([64, 100, 128])
        rows = [
            (f"p{rng.randrange(4)}", i, rng.randrange(1, 2 * target))
            for i in range(rng.randrange(1, 60))
        ]
        want = {}
        by_part: dict[str, int] = {}
        for part, fid, size in sorted(rows, key=lambda r: (r[0], r[1])):
            if size >= target:
                want[(part, fid)] = -1
            else:
                acc = by_part.get(part, 0)
                want[(part, fid)] = acc // target
                by_part[part] = acc + size
        df = spark.createDataFrame(
            rows, "part string, file_id int, size long"
        )
        got = {
            (r["part"], r["file"]): r["group_no"]
            for r in compaction_plan(
                df, "part", "size", "file_id", target_bytes=target
            ).collect()
        }
        assert got == want, (trial, target)


def test_proportional_allocation_random_sweep(spark):
    """Differential sweep: random weights vs a pure-Python Hamilton
    reference (integer remainders, key-ascending tie-break)."""
    import random

    from smart_crawler_spark.operators.relational import (
        proportional_allocation,
    )

    rng = random.Random(99)
    for trial in range(8):
        n = rng.randrange(1, 30)
        rows = [(f"k{i:02d}", rng.randrange(1, 500)) for i in range(n)]
        total = rng.randrange(0, 5000)
        s = sum(w for _, w in rows)
        base = {k: (total * w) // s for k, w in rows}
        rem = sorted(
            ((-((total * w) % s), k) for k, w in rows)
        )
        spare = total - sum(base.values())
        for _, k in rem[:spare]:
            base[k] += 1
        df = spark.createDataFrame(rows, "key string, w long")
        got = {
            r["key"]: r["alloc"]
            for r in proportional_allocation(
                df, "key", "w", total=total
            ).collect()
        }
        assert got == base, (trial, total)
        assert sum(got.values()) == total
