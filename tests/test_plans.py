"""Physical-plan assertions: the plans must stay the plans we designed —
filter/column pushdown into parquet scans, broadcast joins for model
dimension tables, whole-stage codegen (no Python row UDFs) for text ops,
co-partitioned shuffle (no broadcast) for the big seen-set anti-join."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@needs_testdata
def test_parquet_filter_and_column_pushdown(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "2024-06-01").select(
        "l_returnflag", "l_quantity"
    )
    plan = _formatted(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: scan reads only the 3 needed columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_returnflag" in read_schema and "l_extendedprice" not in read_schema


def test_extract_links_uses_broadcast_join(spark):
    from smart_crawler_spark.crawler.extract import extract_links

    pages = spark.createDataFrame(
        [("home", 0, "http://h/", "h", {"//a": ["http://h/x"]})],
        "page_class string, class_depth int, url string, host string,"
        " out_links map<string,array<string>>",
    )
    model = spark.createDataFrame(
        [("home", "//a", 0, "dir", 1)],
        "src_class string, xpath string, edge_pos int, dst_class string,"
        " dst_depth int",
    )
    assert "BroadcastHashJoin" in _plan(extract_links(pages, model))


def test_seen_antijoin_not_broadcast_on_large_seen(spark):
    # the seen side at 10^10 keys must never broadcast; co-partitioned
    # shuffle join is the required shape (we pre-shard both sides)
    from smart_crawler_spark.frontier.dedup import SeenFilter

    f = SeenFilter(spark, use_bloom=False)
    big = spark.range(0, 1_000_000).select(F.xxhash64("id").alias("url_hash"))
    f.add(big)
    cand = spark.range(0, 10).select(
        F.col("id"), F.xxhash64(F.col("id") + F.lit(1)).alias("url_hash")
    )
    plan = _plan(f.filter_new(cand))
    assert "LeftAnti" in plan


def test_textops_stay_jvm_side(spark):
    from smart_crawler_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "der schnelle fuchs")],
        "doc_id long, text string",
    )
    for fn in (
        textops.token_stats,
        textops.language_id,
        textops.quality_score,
        textops.fingerprint,
        textops.repetition_stats,
    ):
        plan = _plan(fn(docs))
        # no Python in the hot path (higher-order array fns are JVM-side
        # even though they opt out of whole-stage codegen)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, fn
    # plain-expression ops stay inside whole-stage codegen spans
    assert "*(1)" in _plan(textops.fingerprint(docs))


def test_frontier_order_total_and_deterministic(spark):
    from smart_crawler_spark.frontier.queue import pick_batch

    rows = [
        (f"http://h/{i}", "h", "c", i % 2, f"c{i % 2}", None) for i in range(20)
    ]
    df = spark.createDataFrame(
        rows,
        "url string, host string, page_class string, class_depth int,"
        " class_name string, form_params string",
    )
    a = [r["url"] for r in pick_batch(df, 5).orderBy("url").collect()]
    b = [r["url"] for r in pick_batch(df.repartition(7), 5).orderBy("url").collect()]
    assert a == b  # partitioning must not change the selected batch


def test_pick_batch_window_group_limit(spark):
    """pick_batch's rank<=k filter must plan as Partial+Final
    WindowGroupLimit (map-side top-K before the shuffle) — the skew
    defense the default (salt_buckets=0) path relies on."""
    from smart_crawler_spark.frontier.queue import pick_batch

    front = spark.range(1000).select(
        F.concat(F.lit("http://x/"), F.col("id")).alias("url"),
        F.concat(F.lit("s"), (F.col("id") % 7)).alias("host"),
        F.lit("detail").alias("page_class"),
        (F.col("id") % 3).cast("int").alias("class_depth"),
        F.lit("detail").alias("class_name"),
        F.lit(None).cast("string").alias("form_params"),
    )
    plan = _formatted(pick_batch(front, budget_per_host=10, salt_buckets=0))
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan and "Final" in plan


def test_pick_batch_global_limit_take_ordered(spark):
    """The page-budget cap (F5) must plan as TakeOrderedAndProject
    (bounded per-task heap + driver merge), never a single-partition
    row_number window funnelling the whole batch through one task."""
    from smart_crawler_spark.frontier.queue import pick_batch

    front = spark.range(1000).select(
        F.concat(F.lit("http://x/"), F.col("id")).alias("url"),
        F.concat(F.lit("s"), (F.col("id") % 7)).alias("host"),
        F.lit("detail").alias("page_class"),
        (F.col("id") % 3).cast("int").alias("class_depth"),
        F.lit("detail").alias("class_name"),
        F.lit(None).cast("string").alias("form_params"),
    )
    import re

    capped = pick_batch(front, budget_per_host=10, global_limit=17)
    plan = _formatted(capped)
    assert "TakeOrderedAndProject" in plan
    # exactly one Window node (the per-host rank), none unpartitioned
    win_nodes = re.findall(r"\(\d+\) Window\b", plan)
    assert len(win_nodes) == 1, plan
    rows = capped.collect()
    assert len(rows) == 17
    # the cap keeps the best rows under the frontier total order
    want = sorted(
        pick_batch(front, budget_per_host=10).collect(),
        key=lambda r: (r["class_depth"], r["class_name"], r["url"]),
    )[:17]
    assert sorted(tuple(r) for r in rows) == sorted(tuple(r) for r in want)


def test_engine_robots_budget_keeps_group_limit(spark):
    """With robots Crawl-delay budgets, the per-host budget join must sit
    AFTER the rank<=k filter so the map-side WindowGroupLimit survives
    (hot-host rounds must not regress to full-shuffle ranking)."""
    from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
    from smart_crawler_spark.frontier.robots import RobotsPolicy

    front = spark.range(1000).select(
        F.concat(F.lit("http://s0/"), F.col("id")).alias("url"),
        F.concat(F.lit("s"), (F.col("id") % 7)).alias("host"),
        F.lit("detail").alias("page_class"),
        (F.col("id") % 3).cast("int").alias("class_depth"),
        F.lit("detail").alias("class_name"),
        F.lit(None).cast("string").alias("form_params"),
    )
    robots = RobotsPolicy({"s0": "User-agent: *\nCrawl-delay: 2"})
    eng = CrawlEngine.__new__(CrawlEngine)
    eng.spark = spark
    eng.cfg = EngineConfig(budget_per_host=10)
    eng._host_delay_budgets = {"s0": 5}
    from smart_crawler_spark.frontier.checkpoint import HOST_STATS_SCHEMA

    stats = spark.createDataFrame([], HOST_STATS_SCHEMA)
    plan = _formatted(eng._pick_batch(front, stats))
    assert "WindowGroupLimit" in plan
    assert robots.crawl_delays_ms() == {"s0": 2000}


def test_pick_batch_salted_equals_plain(spark):
    """Both skew paths must produce the identical batch (exact top-K
    under the frontier total order)."""
    from smart_crawler_spark.frontier.queue import pick_batch

    front = spark.range(5000).select(
        F.concat(F.lit("http://x/"), F.col("id")).alias("url"),
        F.when(F.col("id") % 3 == 0, F.lit("hot")).otherwise(
            F.concat(F.lit("s"), (F.col("id") % 11))
        ).alias("host"),
        F.lit("detail").alias("page_class"),
        (F.col("id") % 3).cast("int").alias("class_depth"),
        F.lit("detail").alias("class_name"),
        F.when(F.col("id") % 17 == 0, F.lit("a=1")).otherwise(
            F.lit(None).cast("string")
        ).alias("form_params"),
    )
    plain = {
        tuple(r) for r in pick_batch(front, 25, salt_buckets=0).collect()
    }
    salted = {
        tuple(r) for r in pick_batch(front, 25, salt_buckets=16).collect()
    }
    assert plain == salted and len(plain) > 0


def test_lsh_band_shuffle_ships_ids_only(spark):
    """The LSH band/bucket exchanges must not carry embedding vectors —
    shipping them through the band shuffle replicates every vector
    bands× at corpus scale. Vectors re-join once per side afterwards."""
    from smart_crawler_spark.operators.simsearch import (
        embedding_near_dup_lsh,
        lsh_bucketed_topk,
    )

    vecs = spark.range(0, 200).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: F.rand(42) + i.cast("double"),
        ).cast("array<float>").alias("embedding"),
    )
    # force the shuffle form of the band join (broadcast hides the
    # exchange at test scale)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try:
        for df in (
            lsh_bucketed_topk(vecs.limit(5), vecs, k=3, dim=8),
            embedding_near_dup_lsh(vecs, threshold=0.9, dim=8),
        ):
            plan = _formatted(df)
            assert "hashpartitioning(band" in plan  # the shuffle is real
            # any node whose attributes include the band column must not
            # also carry a vector column — vectors never ride the band
            # shuffle, in either the exchange or its sort/join consumers
            bad = ("embedding#", "_va#", "_vb#", "_qv#", "_cv#")
            for block in plan.split("\n\n"):
                attrs = [
                    ln
                    for ln in block.splitlines()
                    if ln.startswith(("Input", "Output"))
                ]
                if any("band#" in ln for ln in attrs):
                    assert not any(
                        b in ln for ln in attrs for b in bad
                    ), block
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


@needs_testdata
def test_range_join_plans_as_equi_join(spark):
    """The bucketized interval join must plan as an equi-join on the
    time bin — never a BroadcastNestedLoopJoin/CartesianProduct, which
    is what a naive theta-join (lo <= ts <= hi) degenerates to."""
    import __spark_entry__ as entry

    q = entry.interval_range_join(spark, SF_DIR)
    plan = _plan(q)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "_bin" in plan  # the equi-join key is the time bin


@needs_testdata
def test_redact_pii_is_map_only(spark):
    """PII redaction must stream: no Exchange, no Python eval, pure
    project over the scan (100 TB = one pass, zero shuffles)."""
    from smart_crawler_spark.operators.textops import redact_pii

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(redact_pii(docs))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_aspect_bucket_is_case_chain_no_shuffle(spark):
    """Bucket assignment is a Catalyst CASE chain after the header
    sniff — no join, no Exchange introduced by the bucketing itself."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import aspect_buckets

    plan = _plan(aspect_buckets(generate_images(spark, 8)))
    assert "Exchange" not in plan
    assert "CASE WHEN" in plan


@needs_testdata
def test_bm25_no_corpus_window_and_takeordered(spark):
    """Top-k must plan as TakeOrderedAndProject (no corpus-wide sort);
    the only Window is over the k collected rows; idf/avgdl join back
    as broadcasts."""
    from smart_crawler_spark.operators.textops import bm25_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(bm25_topk(docs, ["spark", "window"], k=5))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@needs_testdata
def test_line_dedup_no_cartesian_no_window(spark):
    """Line dedup = two hash aggs + one equi-join on the line hash —
    never a cartesian product or a corpus-wide window."""
    from smart_crawler_spark.operators.textops import line_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(line_dedup(docs))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # the agg path is groupBy, not window
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )


@needs_testdata
def test_charlm_broadcasts_logprob_tables(spark):
    """The vocab-bounded trigram/context tables must come back as
    broadcasts; no cartesian; no Python eval anywhere."""
    from smart_crawler_spark.operators.textops import charlm_perplexity

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(charlm_perplexity(docs))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@needs_testdata
def test_substring_dup_equi_join_on_fingerprint(spark):
    """The self-join must be an equi-join on the 64-bit fingerprint —
    never a cartesian — and fingerprinting itself is JVM-side."""
    from smart_crawler_spark.operators.textops import substring_dup_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(substring_dup_pairs(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "fp" in plan


def test_joint_dedup_caption_hash_in_lsh_key(spark):
    """The caption hash must be part of the candidate equi-join key
    (hot-phash buckets split by caption), and the pair stage must never
    go cartesian. decode=False isolates the join shape from the UDF."""
    from smart_crawler_spark.operators.images import joint_dup_pairs

    df = spark.createDataFrame(
        [("a", "cap", 1), ("b", "cap", 2)], ["image_id", "caption", "phash"]
    )
    plan = _plan(joint_dup_pairs(df, max_hamming=6, decode=False))
    assert "CartesianProduct" not in plan
    assert "cap_hash" in plan


def test_semantic_dedup_cell_shuffle_ships_ids_only(spark):
    """SemDeDup's cell self-join must carry ids only (vectors would
    replicate n_probe x through the shuffle) and plan no cartesian
    product — the quadratic step stays confined to cell equi-joins."""
    import numpy as np

    from smart_crawler_spark.operators.simsearch import semantic_dedup

    vecs = spark.range(0, 200).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: F.rand(42) + i.cast("double"),
        ).cast("array<double>").alias("embedding"),
    )
    cents = np.eye(4, 8)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try:
        plan = _formatted(
            semantic_dedup(vecs, threshold=0.9, n_probe=2, centroids=cents)
        )
        assert "CartesianProduct" not in plan
        assert "hashpartitioning(cell" in plan  # the cell shuffle is real
        bad = ("embedding#", "_va#", "_vb#")
        for block in plan.split("\n\n"):
            attrs = [
                ln
                for ln in block.splitlines()
                if ln.startswith(("Input", "Output"))
            ]
            if any("cell#" in ln for ln in attrs):
                assert not any(
                    b in ln for ln in attrs for b in bad
                ), block
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_dsir_model_tables_broadcast_back(spark):
    """DSIR's log-ratio and totals tables are bucket-bounded — they must
    join back onto the corpus-sized token stream as BROADCASTS (a
    shuffle join would reshuffle the whole corpus by feature bucket),
    and the whole plan must stay free of Python row UDFs."""
    from smart_crawler_spark.operators.textops import dsir_weights

    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta doc "), F.col("id").cast("string")).alias(
            "text"
        ),
        (F.col("id") % 3 == 0).alias("tgt"),
    )
    plan = _plan(dsir_weights(docs, F.col("tgt"), n_buckets=64))
    assert plan.count("BroadcastHashJoin") >= 2  # lr onto tokens + totals
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_domain_mix_broadcasts_acceptance_no_corpus_shuffle(spark):
    """domain_mix's corpus side must be ONE full-column scan feeding a
    BroadcastHashJoin + map-side filter; the per-domain acceptance
    table (tiny counts aggs over the pruned domain column) is the only
    shuffled data. No corpus-keyed Exchange anywhere."""
    from smart_crawler_spark.operators.relational import domain_mix

    df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = (
        domain_mix(df, "lang", "doc_id", {"en": 0.4, "de": 0.6})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin [lang" in plan
    # the corpus (text column present) is scanned exactly once
    assert sum(
        "text:string" in l for l in plan.splitlines() if "FileScan" in l
    ) == 1
    # no shuffle keyed by the row identity (only tiny lang-keyed aggs)
    assert "hashpartitioning(doc_id" not in plan
    assert "rangepartitioning" not in plan


def test_watermark_hot_set_broadcast_and_single_decode(spark):
    """The watermark miner's join-back must broadcast the (tiny) hot
    set, and the tile table must be materialized so the decode UDF
    (the dominant cost) runs once, not once per reference."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import watermark_patches

    corpus = generate_images(spark, 30, jpeg_every=10, logo_every=7)
    df = watermark_patches(corpus, patch=8, min_images=2)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    # localCheckpoint replaces both tile-scan legs with the cached RDD:
    # exactly one decode (mapInPandas source) may remain in the plan
    assert plan.count("MapInPandas") <= 1, plan


def test_extract_patches_and_augment_are_map_only(spark):
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import (
        augment_images,
        extract_patches,
    )

    corpus = generate_images(spark, 20, jpeg_every=10)
    for df in (
        extract_patches(corpus, patch=8, with_bytes=False),
        augment_images(corpus, augs=("hflip", "rot90")),
    ):
        plan = _plan(df)
        assert "Exchange" not in plan, plan


@needs_testdata
def test_pq_scan_no_cartesian_bounded_shuffle(spark):
    """The PQ/IVF-PQ ADC scans must never plan a cartesian product:
    candidates come out of the mapInPandas scan already top-k-pruned
    per partition, and the only joins are the id equi-joins of the
    exact rerank (query side broadcast)."""
    from smart_crawler_spark.operators import simsearch

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    for df in (
        simsearch.pq_topk(queries, emb, k=2, m=8, n_codes=16),
        simsearch.ivfpq_topk(
            queries, emb, k=2, n_cells=8, n_probe=2, m=8, n_codes=16
        ),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan  # the rerank query side


def test_classifier_weights_broadcast_no_cartesian(spark):
    # the 4096-row weight table must broadcast; the only corpus-keyed
    # shuffle is the per-doc aggregation
    from smart_crawler_spark.operators.textops import (
        hashed_ngram_classifier,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta")],
        "doc_id long, text string",
    )
    plan = _plan(hashed_ngram_classifier(docs))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_chunker_is_map_only(spark):
    from smart_crawler_spark.operators.textops import chunk_documents

    docs = spark.createDataFrame(
        [(1, "x" * 1200)], "doc_id long, text string"
    )
    plan = _plan(chunk_documents(docs))
    assert "Exchange" not in plan  # zero shuffles: rides the scan
    assert "BatchEvalPython" not in plan


def test_zorder_key_is_codegen_expression(spark):
    # the Morton key must stay a pure JVM expression chain — no joins,
    # no shuffles, no Python
    from smart_crawler_spark.operators.relational import zorder_key

    df = spark.range(10).select(
        F.col("id").alias("x"), (F.col("id") * 3).alias("y")
    )
    plan = _plan(df.select(zorder_key(F.col("x"), F.col("y"), 12)))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_host_graph_two_level_agg_partial(spark):
    # both aggregation levels must carry map-side partials so shuffle
    # volume is host-pair-bounded, never link-bounded
    from smart_crawler_spark.operators.graphops import host_graph

    links = spark.createDataFrame(
        [("http://a.t/p1", "http://b.t/q")],
        "src string, dst string",
    )
    plan = _plan(host_graph(links))
    assert plan.count("HashAggregate") >= 4  # 2 levels x partial+final
    assert "CartesianProduct" not in plan


def test_cms_sketch_bounded_and_broadcastable(spark):
    # the point-query join probes the bounded sketch; no cartesian,
    # no Python anywhere
    from smart_crawler_spark.operators.textops import (
        cms_frequency_estimates,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a")], "doc_id long, text string"
    )
    plan = _plan(cms_frequency_estimates(docs, ["a", "zz"]))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_metadata_and_scene_ops_are_map_only(spark):
    """The tEXt audit/strip and the scene-cut detector are pure
    MapInPandas scans — no Exchange, no join: a 100 TB corpus sweep is
    bounded by payload IO."""
    from smart_crawler_spark.datagen.images import (
        generate_images,
        generate_videos,
    )
    from smart_crawler_spark.operators.images import (
        metadata_audit,
        scene_cuts,
        strip_metadata_verify,
    )

    corpus = generate_images(spark, 12, text_meta_every=3)
    vids = generate_videos(spark, 4, n_frames=6, scene_every=4)
    for df in (
        metadata_audit(corpus),
        strip_metadata_verify(corpus),
        scene_cuts(vids),
    ):
        plan = _plan(df)
        assert "MapInPandas" in plan
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan


def test_audio_fingerprint_dedup_hash_only_shuffle(spark):
    """Only (clip_id, 16-byte fp) rows reach the shuffle: the plan has
    no exchange upstream of the fingerprint projection carrying audio
    bytes, and the group join is on the fp key."""
    from smart_crawler_spark.datagen.audio import generate_audio
    from smart_crawler_spark.operators.audio import audio_fingerprint_dedup

    plan = _plan(audio_fingerprint_dedup(generate_audio(spark, 8)))
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    # every Exchange keys on fp — the audio payload never shuffles
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "fp#" in ln, ln


def test_compaction_plan_window_per_partition_no_cartesian(spark):
    """The bin-pack window runs partitioned by the table-partition key
    (never a single global window) and the plan is join-free."""
    from smart_crawler_spark.operators.relational import compaction_plan

    files = spark.createDataFrame(
        [("a", i, 40) for i in range(6)], "part string, file_id int, size long"
    )
    plan = _plan(
        compaction_plan(files, "part", "size", "file_id", target_bytes=128)
    )
    assert "CartesianProduct" not in plan and "Join" not in plan
    win = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition" in ln.lower()
    ]
    assert win and all("part#" in ln for ln in win), plan


def test_prioritized_pick_plan_shape(spark):
    """Priority-mode pick (frontier/priority.py prioritized_pick): the
    per-host rank under PRIORITY_ORDER must still plan the map-side
    WindowGroupLimit skew defense (the comparator is orthogonal to the
    pushdown), the trust table must join as a BroadcastHashJoin after
    the group limit, and no CartesianProduct anywhere."""
    from smart_crawler_spark.frontier.priority import prioritized_pick

    front = spark.range(1000).select(
        F.concat(F.lit("http://x/"), F.col("id")).alias("url"),
        F.concat(F.lit("s"), (F.col("id") % 7)).alias("host"),
        (F.col("id") % 3).cast("int").alias("class_depth"),
        F.lit("detail").alias("class_name"),
        F.lit(None).cast("string").alias("form_params"),
        (F.col("id") % 5 / 10.0).alias("staleness"),
    )
    trust = spark.createDataFrame(
        [("s1", 0.5), ("s2", 0.1)], "host string, trust double"
    )
    plan = _formatted(prioritized_pick(front, budget=10, host_trust=trust))
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan and "Final" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
