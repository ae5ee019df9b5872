"""Relational operators Spark lacks natively, built from DataFrame
primitives (SURVEY §2.6 + pyspark guide 'Common OLAP patterns').

- ``asof_join``: for each left row, the latest right row with
  ``right_ts <= left_ts`` per key — implemented with the union + window
  last-non-null pattern (one sort-based window, no pandas, no range
  explosion; scales as a single shuffle on (key, ts)).
- ``pivot_counts``: dynamic pivot with a pinned column set (deterministic
  schema for oracle comparison).
- ``bfs_depths``: iterative frontier-expansion BFS (SURVEY C10).
- ``range_join``: interval-containment join bucketized on fixed-width
  time bins — an equi-join, never a cartesian theta-join.
- ``stratified_sample``: deterministic hash-threshold sampling per
  stratum — map-side only, reproducible across engines.
- ``domain_mix``: downsampling-only target-distribution resampling
  (training-data mixing) on the same deterministic draw.
- ``deterministic_shuffle``: reproducible global training order +
  shard assignment via a two-phase distributed prefix sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join: latest right row (by right_ts) at or before
    left_ts, per key. Ties on timestamp resolve to the right row that
    sorts last among equals (deterministic: secondary sort on the
    first right col)."""
    lt = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(1)
    )
    rt = (
        right.select(
            F.col(key), F.col(right_ts).alias("_ts"),
            *[F.col(c) for c in right_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    lcols = [c for c in left.columns]
    unioned = lt.select(
        key, "_ts", "_side",
        *[F.col(c).alias(f"_l_{c}") for c in lcols if c != key],
        *[F.lit(None).cast(rt.schema[c].dataType).alias(c) for c in right_cols],
    ).unionByName(
        rt.select(
            key, "_ts", "_side",
            *[F.lit(None).cast(lt.schema[c].dataType).alias(f"_l_{c}")
              for c in lcols if c != key],
            *right_cols,
        )
    )
    # right rows sort before left rows at equal ts (_side 0 < 1), so a
    # left row sees same-timestamp right rows
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(),
                 F.col(right_cols[0]).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # fill the whole right ROW as one struct (null for left rows): a
    # per-column last(ignorenulls) would stitch fields from DIFFERENT
    # right rows whenever the latest row carries nulls — the as-of
    # contract is "the latest row's values, nulls included"
    row = F.when(
        F.col("_side") == 0, F.struct(*[F.col(c) for c in right_cols])
    )
    filled = unioned.select(
        key, "_side",
        *[F.col(f"_l_{c}") for c in lcols if c != key],
        F.last(row, ignorenulls=True).over(w).alias("_r"),
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c != key],
        F.col(key),
        *[F.col("_r")[c].alias(c) for c in right_cols],
    )


def bfs_depths(
    edges: DataFrame,
    start: int,
    max_depth: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """First-visit BFS depth per reachable node (SURVEY C10,
    ``model/PageClass.java:189-200`` — setHierarchy assigns each class
    its first-visit depth from the root).

    Iterative frontier-expansion join in the driver loop (the standard
    Spark fixpoint pattern, SURVEY §2.6 'Iterative fixpoint');
    ``localCheckpoint`` each round cuts lineage so the plan stays flat at
    any graph diameter. The per-round work is one shuffle join on the
    frontier — at 100 TB the edge table would be bucketed by ``src`` so
    every round's join is co-partitioned.

    Returns ``(node, depth)`` with depth = min BFS distance ≤ max_depth.
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    visited = spark.createDataFrame([(start, 0)], "node long, depth int")
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier.node == e._src)
            .select(F.col("_dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(d))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


def _interval_level(
    lo_ts: str, hi_ts: str, bin_width_s: int, max_bins: int
):
    """Level k = smallest k >= 0 with span <= max_bins * w * max_bins^k,
    i.e. the coarsest-enough resolution where the interval explodes to
    at most ~max_bins bins."""
    span = F.unix_timestamp(F.col(hi_ts)) - F.unix_timestamp(F.col(lo_ts))
    raw = F.ceil(
        F.log(float(max_bins), span / F.lit(float(max_bins * bin_width_s)))
    )
    return F.greatest(F.lit(0).cast("long"), F.coalesce(raw, F.lit(0)))


def _binned_intervals(
    intervals: DataFrame,
    lo_ts: str,
    hi_ts: str,
    bin_width_s: int,
    max_bins: int,
) -> DataFrame:
    """Intervals tagged with their resolution level and exploded over
    the bins of THAT level — per interval at most ~max_bins+1 bin rows
    regardless of span (the explosion guard; pinned in
    test_relational_ops.py)."""
    lvl = _interval_level(lo_ts, hi_ts, bin_width_s, max_bins)
    width = (
        F.pow(F.lit(float(max_bins)), F.col("_lvl")).cast("long")
        * bin_width_s
    )
    return (
        intervals.withColumn("_lvl", lvl)
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(lo_ts)) / width),
                    F.floor(F.unix_timestamp(F.col(hi_ts)) / width),
                )
            ),
        )
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_ts: str,
    hi_ts: str,
    bin_width_s: int = 300,
    extra_keys: list[str] | None = None,
    max_bins_per_interval: int = 64,
) -> DataFrame:
    """Interval-containment join (lo <= point <= hi) without a
    theta-join cartesian: intervals explode over fixed-width time bins,
    points map to bins, the two sides equi-join on the bin and the
    exact predicate filters inside the join partition. ``extra_keys``
    (columns present on both sides, e.g. a user id) join alongside the
    bin, tightening shuffle partitioning to (key, bin).

    Span guard: a single pathological interval (a days-long span over
    300 s bins) must not explode into thousands of bin rows, so the bin
    index is MULTI-RESOLUTION — level k uses width
    ``bin_width_s * max_bins_per_interval^k`` and each interval lives at
    the one level where it covers <= ~max_bins_per_interval bins. Points
    emit one row per level (a map-side explode by a 1-3 element array —
    the level count comes from one tiny max-span aggregate over the
    interval side) and the join key is (level, bin), so the whole join
    is still ONE equi-join shuffle. A qualifying pair matches at exactly
    the interval's level on exactly one bin — no post-join dedup. With
    well-sized bins (typical span ~ bin width) there is one level and
    the plan is identical to the single-resolution one."""
    w = bin_width_s
    f = max_bins_per_interval
    span = F.unix_timestamp(F.col(hi_ts)) - F.unix_timestamp(F.col(lo_ts))
    max_span = intervals.agg(F.max(span)).first()[0] or 0
    n_levels = 1
    while f * w * (f ** (n_levels - 1)) < max_span:
        n_levels += 1

    i = _binned_intervals(intervals, lo_ts, hi_ts, w, f)
    width = F.pow(F.lit(float(f)), F.col("_lvl")).cast("long") * w
    p = points.withColumn(
        "_lvl", F.explode(F.array(*[F.lit(k).cast("long") for k in range(n_levels)]))
    ).withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(point_ts)) / width)
    )
    return (
        p.join(i, ["_lvl", "_bin"] + (extra_keys or []))
        .filter(
            (F.col(point_ts) >= F.col(lo_ts))
            & (F.col(point_ts) <= F.col(hi_ts))
        )
        .drop("_lvl", "_bin")
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    fractions: dict[str, float],
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff the first 8
    hex digits of ``md5(key)`` — a uniform draw in [0, 2^32)
    reproducible in any engine — fall below the stratum's fraction.
    Pure map-side filter: no shuffle, no RNG state, no driver round
    trip, so it scales linearly with input and yields the SAME sample
    on every run, engine, and partitioning (unlike ``df.sample``, whose
    output depends on partition layout). Strata missing from
    ``fractions`` are dropped (fraction 0.0)."""
    from smart_crawler_spark.operators.textops import md5_hash32

    u = md5_hash32(key_col).cast("double") / float(1 << 32)
    frac = F.create_map(
        *[x for kv in fractions.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )
    return df.filter(u < F.coalesce(frac[F.col(stratum_col)], F.lit(0.0)))


def pivot_counts(
    df: DataFrame, group_col: str, pivot_col: str, values: list[str]
) -> DataFrame:
    """Pivoted counts with a pinned value set (stable output schema)."""
    return (
        df.groupBy(group_col)
        .pivot(pivot_col, values)
        .agg(F.count(F.lit(1)))
        .na.fill(0, values)
    )


def domain_mix(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    targets: dict[str, float],
) -> DataFrame:
    """Target-distribution resampling (training-data "mixing"): keep a
    deterministic subset whose per-domain shares match ``targets`` as
    closely as downsampling-only allows. The feasible output size is
    capped by the scarcest domain — cap = min over domains of
    n_d / t_d — and each domain keeps rows with acceptance probability
    p_d = t_d * cap / n_d (the binding domain keeps everything, over-
    represented domains are thinned). The draw is the shared md5
    uniform (``md5_hash32``), so the SAME rows survive on every run,
    engine, and partitioning.

    Scale shape: one tiny groupBy(domain) count (domains are few), a
    driver-free min-aggregate over that count table, and a broadcast
    join of the per-domain acceptance back onto the corpus — the corpus
    itself is touched by exactly one map-side filter, no corpus
    shuffle. Domains absent from ``targets`` are dropped; target
    domains absent from the data are ignored (the mix is then
    renormalized over present domains by construction of the cap)."""
    from smart_crawler_spark.operators.textops import md5_hash32

    tgt = F.create_map(
        *[x for kv in targets.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )
    counts = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).cast("double").alias("_n"))
        .withColumn("_t", tgt[F.col(domain_col)])
        .filter(F.col("_t").isNotNull())
    )
    cap = counts.agg(F.min(F.col("_n") / F.col("_t")).alias("_cap"))
    accept = counts.crossJoin(F.broadcast(cap)).select(
        domain_col,
        (F.col("_t") * F.col("_cap") / F.col("_n")).alias("_p"),
    )
    u = md5_hash32(key_col).cast("double") / float(1 << 32)
    return (
        df.join(F.broadcast(accept), domain_col)
        .filter(u < F.col("_p"))
        .drop("_p")
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic global training order: every row gets a position
    in a pseudo-random total order (sort key = the md5 uniform, ties
    broken by the key itself) and a round-robin shard assignment
    ``pos % n_shards`` — the reproducible corpus shuffle a training
    run needs so that re-runs, resumes, and engines agree byte-for-byte
    on example order.

    Scale shape: the naive row_number() over a global ORDER BY is a
    single-partition sort of the whole corpus. Instead the order is
    computed as a two-phase distributed prefix sum (the sequence_pack
    pattern): the top bits of the draw split rows into ``n_buckets``
    ordered buckets, each bucket ranks locally (a window partitioned BY
    BUCKET — n_buckets-way parallel, no corpus-sized partition), and a
    tiny n_buckets-row prefix-sum of bucket counts broadcasts the
    global offsets. Because the bucket is a PREFIX of the sort key,
    bucket-major order == global order. Buckets come from the data, not
    from partition ids, so the result is layout-independent."""
    from smart_crawler_spark.operators.textops import md5_hash32

    h = md5_hash32(key_col)
    bucket = (h / F.lit(float(1 << 32) / n_buckets)).cast("long")
    rows = df.withColumn("_u", h).withColumn("_b", bucket)
    w = Window.partitionBy("_b").orderBy("_u", key_col)
    ranked = rows.withColumn("_r", F.row_number().over(w))
    offs = (
        rows.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_c").over(
                    Window.orderBy("_b").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_b", "_off")
    )
    return (
        ranked.join(F.broadcast(offs), "_b")
        .withColumn("pos", (F.col("_off") + F.col("_r") - 1).cast("long"))
        .withColumn("shard", (F.col("pos") % n_shards).cast("int"))
        .drop("_u", "_b", "_r", "_off")
    )


def group_sample_k(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Deterministic k-per-group sample: rows rank within their group
    by the md5 draw (ties -> key) and the first k survive — the
    reproducible alternative to per-group reservoir sampling, with the
    same guarantee as stratified_sample (identical output on any run,
    engine, layout) but an EXACT count per group instead of an expected
    fraction.

    Scale shape: the rank<=k filter plans as WindowGroupLimit
    (Spark 4): a Partial limit runs map-side BEFORE the shuffle, so
    each map task ships at most ~k rows per group — the shuffle is
    bounded by k * n_groups, not the corpus (measured 2.7x over hand-
    salted two-phase top-k in this repo's frontier pick, test_plans)."""
    from smart_crawler_spark.operators.textops import md5_hash32

    u = md5_hash32(key_col)
    w = Window.partitionBy(group_col).orderBy(u.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .withColumn("rk", F.col("_rk").cast("int"))
        .drop("_rk")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Delta between two snapshot tables: one row per key with
    ``change`` in {added, removed, changed, unchanged} — the standard
    incremental-index question ("what moved between crawl snapshot N
    and N+1") asked of a 10^10-row seen/frontier/content table.

    One full-outer shuffle join on the key; comparisons are null-safe
    (``eqNullSafe`` / SQL IS NOT DISTINCT FROM) so a null-to-value
    transition counts as changed, not unchanged. At rest both
    snapshots live bucketed by the key (sources/bucketed.py), making
    the join Exchange-free on both sides; output carries the key plus
    the change tag — callers filter ``change != 'unchanged'`` and let
    the filter push into the join's output."""
    o = old.select(
        *[F.col(c).alias(f"_ok_{c}") for c in key_cols],
        *[F.col(c).alias(f"_ov_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(c).alias(f"_nk_{c}") for c in key_cols],
        *[F.col(c).alias(f"_nv_{c}") for c in compare_cols],
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"_ok_{c}") == F.col(f"_nk_{c}")
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"_ov_{c}").eqNullSafe(F.col(f"_nv_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col(f"_ok_{key_cols[0]}").isNull(), F.lit("added"))
        .when(F.col(f"_nk_{key_cols[0]}").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"_nk_{c}"), F.col(f"_ok_{c}")).alias(c)
            for c in key_cols
        ],
        change.alias("change"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    target_fraction: float = 1.0,
) -> DataFrame:
    """Deterministic weight-proportional sampling: row i survives iff
    the md5 uniform draw on its key falls below
    ``target_fraction * w_i / max(w)`` — inclusion probability
    proportional to weight (clamped at 1), the standard quality- or
    DSIR-weighted resample step. Same layout/engine/run-independence
    guarantees as stratified_sample (the draw is a pure function of
    the key), with ONE tiny aggregation (the global max weight)
    broadcast back — the corpus itself is touched by a single map-side
    filter. Non-positive weights never survive."""
    from smart_crawler_spark.operators.textops import md5_hash32

    mx = df.select(F.max(F.col(weight_col)).alias("_wmax"))
    u = md5_hash32(key_col).cast("double") / float(1 << 32)
    p = F.least(
        F.lit(1.0),
        F.lit(float(target_fraction)) * F.col(weight_col) / F.col("_wmax"),
    )
    return (
        df.join(F.broadcast(mx))
        .filter((F.col(weight_col) > 0) & (u < p))
        .drop("_wmax")
    )


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Collapse per-snapshot rows into SCD2 validity intervals: one row
    per (key, run of identical values) with ``valid_from`` /
    ``valid_to`` versions (valid_to null = current) — how a crawl
    index keeps page-state history across snapshot rounds without
    storing every round in full.

    Scale shape: both windows partition by the KEY (never the corpus),
    so this is one shuffle on the key and linear work per key-history;
    change detection is null-safe (a null-to-value flip opens a new
    interval). The run-id is the classic gaps-and-islands prefix sum
    of change flags."""
    key = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*key).orderBy(F.col(version_col).asc())
    changed = F.lag(F.col(version_col)).over(w).isNull()
    for c in compare_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    runs = df.withColumn("_run", F.sum(changed.cast("int")).over(w))
    agg = runs.groupBy(*key, F.col("_run")).agg(
        *[F.first(c).alias(c) for c in compare_cols],
        F.min(version_col).alias("valid_from"),
    )
    w2 = Window.partitionBy(*key).orderBy(F.col("valid_from").asc())
    return (
        agg.withColumn("valid_to", F.lead("valid_from").over(w2))
        .drop("_run")
        .select(*key_cols, *compare_cols, "valid_from", "valid_to")
    )


def zorder_key(x: Column, y: Column, bits: int = 12) -> Column:
    """Morton / Z-order key: interleave the low ``bits`` bits of two
    dimension columns into one space-filling-curve value (Delta/Iceberg
    OPTIMIZE ZORDER's clustering key). Sorting or range-bucketing rows
    by this key gives every storage tile a TIGHT min/max range on BOTH
    dimensions at once, so a scan filtered on either column prunes
    ~sqrt-fraction of files instead of reading everything — the layout
    lever for two-dimensional crawl predicates (host x time,
    width x height) at 100 TB.

    Built as a static chain of shiftright/AND/shiftleft JVM expressions
    (2*bits terms, whole-stage-codegen'd; no Python, no UDF)."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(
                F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)),
                2 * i + 1,
            )
            + F.shiftleft(
                F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)),
                2 * i,
            )
        )
    return key


def zorder_tile_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 12,
    tile_bits: int = 8,
) -> DataFrame:
    """Z-order layout audit: assign every row to the storage tile given
    by the TOP ``tile_bits`` bits of its Morton key (a quadtree cell —
    exactly the file a ZORDER-clustered writer would place it in) and
    aggregate per-tile min/max/count for both dimensions. The per-tile
    spans are the min/max footer stats a pruning scan reads: with
    interleaved bits each of the 2^tile_bits tiles covers only a
    2^(bits - tile_bits/2)-wide slice of EACH dimension, the property
    the oracle asserts numerically. Map + one bounded groupBy (at most
    2^tile_bits groups) — no global sort needed to audit the layout."""
    x = F.col(x_col)
    y = F.col(y_col)
    tile = F.shiftright(zorder_key(x, y, bits), 2 * bits - tile_bits)
    return (
        df.select(x.alias("_x"), y.alias("_y"), tile.alias("tile"))
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_x").alias("min_x"),
            F.max("_x").alias("max_x"),
            F.min("_y").alias("min_y"),
            F.max("_y").alias("max_y"),
        )
    )


def compaction_plan(
    files: DataFrame,
    part_col: str,
    size_col: str,
    file_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-file compaction planner — the Iceberg
    ``rewrite_data_files`` / Delta OPTIMIZE bin-pack, as a pure
    DataFrame op over the file ledger (metadata: one row per data
    file). Files at or above ``target_bytes`` are already healthy and
    pass through as ``group_no = -1`` (not rewritten); smaller files
    are packed in ``file_col`` order within their partition:
    group = floor(exclusive-prefix-sum of sizes / target), so each
    group's START offset lies < target bytes past the previous group
    boundary and no group mixes partitions. (A file straddling a
    boundary belongs to the group its start falls in, so a non-final
    group's TOTAL can land below target — sizes [115, 26, 115, 26] at
    target 128 give groups [0, 0, 1, 2] with group 1 holding only 115
    bytes. The rule trades the usual >=target fill guarantee for a
    purely positional assignment with no carried accumulator state,
    which keeps it one window expression.) Deterministic (no
    first-fit-decreasing heuristics), which is what makes the plan
    SQL-replayable and idempotent across planner runs.

    Scale: the ledger is metadata (~10^6 rows for a 100 TB table), so
    the per-partition window cumsum is bounded by the largest
    partition's FILE COUNT, never by data volume; one shuffle on the
    partition key, no data files touched.

    Output: (part, file, size, group_no) — the rewrite manifest."""
    part = F.col(part_col)
    size = F.col(size_col).cast("long")
    w = (
        Window.partitionBy(part_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    eligible = F.col(size_col) < F.lit(target_bytes)
    return (
        files.filter(eligible)
        .select(
            part.alias("part"),
            F.col(file_col).alias("file"),
            size.alias("size"),
            F.floor(
                F.coalesce(F.sum(size_col).over(w), F.lit(0))
                / F.lit(target_bytes)
            )
            .cast("int")
            .alias("group_no"),
        )
        .unionByName(
            files.filter(~eligible).select(
                part.alias("part"),
                F.col(file_col).alias("file"),
                size.alias("size"),
                F.lit(-1).cast("int").alias("group_no"),
            )
        )
    )


def proportional_allocation(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    total: int,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: split ``total``
    integer slots across keys proportionally to integer weights, so
    that every key gets floor(total*w/S) and the R = total - sum(floor)
    leftover slots go to the R largest remainders (ties broken by key
    ascending — fully deterministic). The frontier-scheduling use: turn
    host importance mass (page counts, TrustRank) into per-host fetch
    quotas that sum EXACTLY to the round's global budget.

    All arithmetic is integer (div/mod on total*w), so the result is
    bit-exact and SQL-replayable — no float remainders to tie-break.
    The ranking window is a single pass over the KEY table (one row per
    host — metadata scale, bounded by distinct keys, never by corpus
    rows), same justification as the compaction ledger window.

    Output: (key, weight, alloc) with sum(alloc) == total.

    Raises ``ValueError`` when the weight mass is zero (empty input or
    all-zero weights): there is no proportional split of a positive
    total over zero mass, and the silent alternative is a divide-by-
    zero null cascade that breaks the sum(alloc) == total contract."""
    s = df.agg(F.sum(weight_col).cast("long").alias("_s"))
    # Eager 1-row guard, mirroring personalized_pagerank's empty-seed
    # check: a zero mass would otherwise divide-by-zero into nulls.
    if not s.collect()[0]["_s"]:
        raise ValueError(
            "proportional_allocation: sum(weights) is 0 "
            "(empty input or all-zero weights); cannot apportion "
            f"total={total}"
        )
    base = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(weight_col).cast("long").alias("weight"),
        )
        .crossJoin(F.broadcast(s))
        .select(
            "key",
            "weight",
            F.expr(f"({total} * weight) div _s").alias("_base"),
            F.expr(f"({total} * weight) % _s").alias("_rem"),
        )
    )
    spare = base.agg(
        (F.lit(total) - F.sum("_base")).cast("long").alias("_r")
    )
    w = Window.orderBy(F.desc("_rem"), F.asc("key"))
    return (
        base.crossJoin(F.broadcast(spare))
        .withColumn("_rank", F.row_number().over(w))
        .select(
            "key",
            "weight",
            (
                F.col("_base")
                + F.when(F.col("_rank") <= F.col("_r"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc"),
        )
    )


def temperature_mix(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled domain resampling (the multilingual-LM
    alpha-sampling rule, Conneau et al. XLM-R / mT5): target share
    t_d = n_d^alpha / sum_e n_e^alpha, flattening the natural domain
    distribution toward uniform as alpha -> 0. Unlike ``domain_mix``
    the targets are DERIVED FROM THE DATA, so no caller dictionary —
    the one extra step is normalizing the powered counts. Downsampling-
    only: cap = min n_d/t_d sizes the output by the binding domain and
    acceptance p_d = t_d * cap / n_d, on the shared md5 uniform draw so
    the same rows survive on every engine and partitioning.

    Scale shape: identical to domain_mix — one tiny domain-count agg,
    1-row broadcast normalizer + cap, one broadcast join back, one
    map-side filter; the corpus never shuffles."""
    from smart_crawler_spark.operators.textops import md5_hash32

    counts = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    norm = counts.agg(
        F.sum(F.pow(F.col("_n"), F.lit(alpha))).alias("_z")
    )
    tgt = counts.crossJoin(F.broadcast(norm)).select(
        domain_col,
        F.col("_n"),
        (F.pow(F.col("_n"), F.lit(alpha)) / F.col("_z")).alias("_t"),
    )
    cap = tgt.agg(F.min(F.col("_n") / F.col("_t")).alias("_cap"))
    accept = tgt.crossJoin(F.broadcast(cap)).select(
        domain_col,
        (F.col("_t") * F.col("_cap") / F.col("_n")).alias("_p"),
    )
    u = md5_hash32(key_col).cast("double") / float(1 << 32)
    return (
        df.join(F.broadcast(accept), domain_col)
        .filter(u < F.col("_p"))
        .drop("_p")
    )


def numeric_histogram(
    df: DataFrame,
    col: str,
    bin_width: float,
    min_val: float = 0.0,
) -> DataFrame:
    """Equi-width histogram over a numeric column — the ANALYZE-style
    corpus-profiling primitive (document-length, image-size, token-
    count distributions at 100 TB): one map-side bin assignment + one
    partial-aggregated groupBy whose output is bin-count-bounded, never
    corpus-bounded. Bins are half-open [lo, hi); only occupied bins are
    emitted (a sparse distribution stays sparse).

    Output: (bin_id, lo, hi, n_rows) — lo/hi from exact bin arithmetic
    so the SQL oracle reproduces them bit-for-bit."""
    c = F.col(col).cast("double")
    b = F.floor((c - min_val) / bin_width).cast("long")
    return (
        df.filter(c.isNotNull())
        .groupBy(b.alias("bin_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select(
            "bin_id",
            (F.lit(min_val) + F.col("bin_id") * bin_width).alias("lo"),
            (F.lit(min_val) + (F.col("bin_id") + 1) * bin_width).alias("hi"),
            "n_rows",
        )
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    within_s: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered event-funnel analysis: how many users performed step 1,
    then step 2 STRICTLY AFTER their first step 1, then step 3 after
    that, ... all within ``within_s`` seconds of the first step-1 event
    (the earliest-completion semantics every funnel product uses:
    first qualifying timestamp per step, per user).

    Scale shape: one user-keyed aggregation PER STEP over the
    type-filtered event stream (the filter prunes at the scan), each
    joined to the previous step's per-user frontier — k steps = k
    shuffles on the user key, re-using the same partitioning, never a
    self-join of the raw stream on itself. The output is k rows.

    Output: (step, event_type, n_users, conversion) — conversion =
    n_users / step-1 users, rounded 6 dp."""
    spark = events.sparkSession
    u, t, ts = F.col(user_col), F.col(type_col), F.col(ts_col)
    cur = (
        events.filter(t == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t1"))
        .withColumn("_lim", F.col("_t1") + F.expr(f"INTERVAL {within_s} SECOND"))
        .withColumn("_prev", F.col("_t1"))
    )
    counts = [cur.count()]
    for step in steps[1:]:
        nxt = (
            events.filter(t == step)
            .join(cur.select(user_col, "_prev", "_lim"), user_col)
            .filter((ts > F.col("_prev")) & (ts <= F.col("_lim")))
            .groupBy(user_col)
            .agg(
                F.min(ts_col).alias("_prev"),
                F.first("_lim").alias("_lim"),
            )
        )
        counts.append(nxt.count())
        cur = nxt
    rows = [
        (i + 1, s, int(n)) for i, (s, n) in enumerate(zip(steps, counts))
    ]
    base = spark.createDataFrame(
        rows, "step int, event_type string, n_users long"
    )
    # conversion rounds ENGINE-side (F.round == SQL round half-up), not
    # via python round() (banker's), so the oracle hash can't diverge
    # on a .5 boundary
    denom = float(counts[0]) if counts[0] else 1.0
    return base.select(
        "step",
        "event_type",
        "n_users",
        F.round(F.col("n_users") / denom, 6).alias("conversion"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Retention-cohort analysis: cohort = each user's FIRST event day;
    a user is retained at day offset k if they have any event exactly
    k days after their cohort day. The activation/decay curve every
    ingest dashboard draws, and (for a crawler) the host-revisit
    activity matrix.

    Scale shape: one user-keyed min-aggregation for cohort days, one
    broadcast-join back (the per-user cohort frame is |users|-sized,
    dwarfed by the event stream), then a distinct + count whose output
    is |cohorts| x |offsets| — calendar-bounded, not data-bounded.

    Output: (cohort_day, day_offset, n_users)."""
    day = F.to_date(F.col(ts_col))
    firsts = (
        events.select(F.col(user_col), day.alias("_d"))
        .groupBy(user_col)
        .agg(F.min("_d").alias("cohort_day"))
    )
    return (
        events.select(F.col(user_col), day.alias("_d"))
        .join(F.broadcast(firsts), user_col)
        .select(
            user_col,
            "cohort_day",
            F.datediff(F.col("_d"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key_col: str = "key",
    op_col: str = "op",
) -> DataFrame:
    """MERGE INTO semantics (the Iceberg/Delta CDC-apply): fold a
    changeset with an op column into a base table —

      op='D', key matched   -> row deleted
      op='U', key matched   -> value columns replaced by the change row
      op='I', key NOT matched -> row inserted
      op='I' on a matched key, or 'U'/'D' on a missing key -> no-op
      (exactly SQL MERGE: matched rows see only WHEN MATCHED clauses,
      unmatched only WHEN NOT MATCHED)

    Caller contract: at most one change row per key (the usual CDC
    compaction precondition).

    Scale shape: ONE full-outer join on the key — Exchange-free on the
    stored side when base and changeset are bucketed on the key (the
    same layout argument as snapshot_diff); the merge decision is a
    map-side CASE over the joined row. Returns the merged table with
    base's column set."""
    val_cols = [c for c in base.columns if c != key_col]
    b = base.alias("b")
    c = changes.alias("c")
    joined = b.join(c, F.col(f"b.{key_col}") == F.col(f"c.{key_col}"), "full_outer")
    in_base = F.col(f"b.{key_col}").isNotNull()
    in_chg = F.col(f"c.{key_col}").isNotNull()
    op = F.col(f"c.{op_col}")
    keep = (
        (in_base & ~in_chg)
        | (in_base & in_chg & (op == "I"))          # matched insert: no-op
        | (in_base & in_chg & ~op.isin("D", "U", "I"))
        | (~in_base & in_chg & (op == "I"))         # true insert
        | (in_base & in_chg & (op == "U"))          # update
    )
    use_change = (in_chg & (op == "U") & in_base) | (~in_base & (op == "I"))
    cols = [
        F.coalesce(F.col(f"b.{key_col}"), F.col(f"c.{key_col}")).alias(key_col)
    ]
    for vc in val_cols:
        cols.append(
            F.when(use_change, F.col(f"c.{vc}"))
            .otherwise(F.col(f"b.{vc}"))
            .alias(vc)
        )
    return joined.filter(keep).select(*cols)


def rolling_distinct(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window distinct counts (trailing ``window_days``-day
    distinct users per calendar day) — the one rolling metric a plain
    window function CANNOT produce, because distinct counts don't sum
    across days the way rolling_avg's sums do.

    Scale shape: each (user, active-day) pair — already deduped, so
    bounded by users x days, not by raw events — explodes into the
    <= ``window_days`` window-end days it contributes to (a map-side
    sequence explode), then ONE count_distinct aggregation per window
    day. Shuffle volume = active-pairs x window_days; output =
    calendar-bounded. Only days with at least one contributing event
    appear (the trailing window makes day d cover (d-window, d]).

    Output: (day, n_distinct_users) with day as DATE."""
    day = F.to_date(F.col(ts_col))
    pairs = events.select(F.col(user_col), day.alias("_d")).distinct()
    exploded = pairs.select(
        user_col,
        F.explode(
            F.sequence(
                F.col("_d"),
                F.date_add(F.col("_d"), window_days - 1),
            )
        ).alias("day"),
    )
    return (
        exploded.groupBy("day")
        .agg(F.count_distinct(user_col).cast("long").alias("n_distinct_users"))
    )
