"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the crawl-engine
microbench (frontier dedup ops/sec + fetched URLs/sec on a synthetic
site). Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "crawl": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from smart_crawler_spark.session import spark_session  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "frontier_dedup",
    "per_host_topk",
    "url_canonicalize",
    "exact_dedup",
    "token_stats",
    "language_id",
    "quality_score",
    "sessionize",
    "regex_join_eval",
    "minhash_near_dup",
    "simhash_near_dup",
    "embedding_topk",
    "lsh_embedding_topk",
    "ivf_embedding_topk",
    "pq_embedding_topk",
    "embedding_near_dup",
    "phash_near_dup",
    "image_decode_verify",
    "watermark_detect",
    "image_patch_verify",
    "video_frame_sample",
    "image_ingest_dedup",
    "webdataset_roundtrip",
    "fasttext_quality",
    "chunk_split",
    "zorder_layout",
    "char_entropy",
    "truncation_pairs",
    "hard_negatives",
    "tfidf_cosine",
    "trustrank",
    "merge_upsert",
    "fuzzy_join_keys",
    "pmi_collocations",
    "rrf_fusion",
    "quality_auc",
    "bm25_ndcg",
    "zipf_fit",
    "unicode_dedup",
    "video_scene_cuts",
    "audio_near_dup",
    "compaction_plan",
    "crawl_budget_alloc",
    "crawl_site_prioritized",
    "fielded_bm25",
]

# FROZEN round-over-round subset (do not grow): suite_sec is only
# comparable across rounds at equal list length, and HEADLINE grows
# every round — SUITE20 is the fixed basket whose sum (suite20_sec)
# stays one comparable number. All 20 have been in HEADLINE since
# round 3 or earlier; timings reuse the HEADLINE runs (no extra work).
SUITE20 = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "frontier_dedup",
    "per_host_topk",
    "url_canonicalize",
    "exact_dedup",
    "token_stats",
    "language_id",
    "quality_score",
    "sessionize",
    "minhash_near_dup",
    "simhash_near_dup",
    "embedding_topk",
    "ivf_embedding_topk",
    "pq_embedding_topk",
    "embedding_near_dup",
    "phash_near_dup",
    "image_decode_verify",
    "video_frame_sample",
    "trustrank",
]


def bench_queries(spark, sf_dir: str) -> tuple[dict[str, float], list[float]]:
    qs = entrymod.queries()
    out: dict[str, float] = {}
    # one-time session warm-up (JVM codegen + parquet footer cache) so
    # per-query timings measure the query, not cold-start
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(
        1
    ).count()
    # min-of-2 per query: this VM's shared infrastructure has slow
    # phases where EVERYTHING runs ~40% slower (raw-CPU stays fast);
    # the better draw estimates machine capability (cf. BASELINE.md
    # variance methodology, same estimator as the crawl/scaling tables).
    # The suite is bracketed by the same fixed-cost calib kernel as the
    # crawl bench (start / middle / end): a round where every query
    # looks slow next to inflated calib samples is a machine phase, not
    # a regression — compare queries via suite_calib_ratio across
    # rounds, not wall seconds.
    calib = [round(_calib_spark(spark), 3)]
    for i, name in enumerate(HEADLINE):
        fn = qs[name]
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            n = fn(spark, sf_dir).count()
            sec = time.monotonic() - t0
            best = sec if best is None else min(best, sec)
            assert n >= 0
        out[name] = round(best, 3)
        if i == len(HEADLINE) // 2:
            calib.append(round(_calib_spark(spark), 3))
    calib.append(round(_calib_spark(spark), 3))
    return out, calib


def _calib_spark(spark) -> float:
    """Fixed-cost Spark shuffle+agg kernel (constant input, constant
    plan): its wall time moves ONLY with the VM/JVM phase, so a slow
    crawl sample next to a slow calib sample is machine noise, while a
    slow crawl next to a clean calib is a code regression."""
    from pyspark.sql import functions as F

    t0 = time.monotonic()
    (
        spark.range(20_000_000)
        .select(F.xxhash64("id").alias("h"))
        .groupBy(F.pmod("h", F.lit(997)).alias("b"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("h").alias("s"))
        .count()
    )
    return time.monotonic() - t0


def _calib_cpu() -> float:
    """Fixed-cost raw-CPU kernel (numpy matmul chain) — separates
    'whole box slow' from 'Spark/shuffle path slow, CPU fine', the
    documented shape of this VM's slow phases (BASELINE.md)."""
    import numpy as np

    a = np.random.Generator(np.random.PCG64(1)).standard_normal((512, 512))
    t0 = time.monotonic()
    for _ in range(24):
        a = a @ a
        a /= np.abs(a).max() + 1.0
    assert a.shape == (512, 512)
    return time.monotonic() - t0


def bench_crawl(spark) -> dict[str, float]:
    """Crawl throughput: drain a synthetic multi-host site with a real
    engine run (politeness budget = 200/host/round), and time the
    sharded seen-filter on a 2M-candidate batch."""
    from pyspark.sql import functions as F

    from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
    from smart_crawler_spark.datagen.site import (
        SiteConfig,
        generate_site_pages,
        target_tsv,
    )
    from smart_crawler_spark.frontier.dedup import BloomConfig, SeenFilter
    from smart_crawler_spark.sources.targets import load_target_tsv

    # --- dedup ops/sec: 2M candidates vs 1M-key seen set -----------------
    n_seen, n_cand = 1_000_000, 2_000_000
    seen_keys = spark.range(n_seen).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash")
    )
    cand = spark.range(n_cand).select(
        F.col("id"),
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"),
    )
    # exact co-partitioned anti-join — the fast path at this |seen|/|cand|
    # ratio (the bloom prefilter only wins when |seen| >> |candidates|;
    # tradeoff measured in BASELINE.md)
    filt = SeenFilter(spark, use_bloom=False)
    filt.add(seen_keys)
    filt.materialize()
    t0 = time.monotonic()
    n_new = filt.filter_new(cand).count()
    dedup_sec = time.monotonic() - t0
    assert n_new == n_cand - n_seen
    # bloom-prefiltered path, reported separately
    bfilt = SeenFilter(
        spark, BloomConfig(shards=64, bits_per_shard=1 << 22, num_hashes=5),
        use_bloom=True,
    )
    bfilt.add(seen_keys)
    bfilt.materialize()
    # warm probe: builds + broadcasts the dense bitmap once (amortized
    # over a crawl's many rounds; not part of per-batch throughput)
    bfilt.filter_new(cand.limit(10)).count()
    t0 = time.monotonic()
    n_new_b = bfilt.filter_new(cand).count()
    bloom_sec = time.monotonic() - t0
    assert n_new_b == n_cand - n_seen
    # drop cached seen-filter state so the crawl timing below is clean
    spark.catalog.clearCache()

    # --- fetched URLs/sec: drain a ~108k-page site -----------------------
    cfg = SiteConfig(
        n_hosts=16, dirs=4, chain=3, details_per_page=500, n_images=1000,
        skew_factor=3,
    )
    pages = generate_site_pages(spark, cfg).localCheckpoint()
    total_pages = pages.count()
    model = load_target_tsv(target_tsv(cfg))
    # best-of-2 with an INTERLEAVED fixed-cost calibration kernel: this
    # VM shows ±40% run-to-run variance (cloud noisy neighbor,
    # documented in BASELINE.md); the calib samples bracketing each
    # crawl run make a slow phase visible in the JSON itself — a slow
    # crawl flanked by slow calib is machine noise, a slow crawl with
    # clean calib would be a real regression
    runs = []
    calib = {"spark_sec": [], "cpu_sec": []}

    def _sample_calib():
        calib["spark_sec"].append(round(_calib_spark(spark), 3))
        calib["cpu_sec"].append(round(_calib_cpu(), 3))

    for _ in range(2):
        _sample_calib()
        workdir = tempfile.mkdtemp(prefix="bench_crawl_")
        try:
            eng = CrawlEngine(
                spark, pages, model, workdir,
                EngineConfig(budget_per_host=6000, salt_buckets=0,
                             use_bloom=False),
            )
            t0 = time.monotonic()
            res = eng.run([f"http://{cfg.host(k)}/" for k in range(cfg.n_hosts)])
            crawl_sec = time.monotonic() - t0
            fetched = res.order.filter("fetched").count()
            runs.append((crawl_sec, fetched, res.rounds))
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    _sample_calib()
    crawl_sec, fetched, rounds = min(runs)

    # --- priority-mode overhead leg (one run): same site, same budget,
    # priority_mode on with a full-trust table and no churn — the work
    # shape is identical to the parity run, so crawl_priority_sec /
    # crawl_sec isolates the mode's own cost (staleness column, visit-
    # stats merge, broadcast trust join). Demotion/staleness SEMANTICS
    # are correctness-tested in tests/test_priority_mode.py; this leg
    # prices the machinery.
    trust_df = spark.createDataFrame(
        [(cfg.host(k), 1.0) for k in range(cfg.n_hosts)],
        "host string, trust double",
    )
    workdir = tempfile.mkdtemp(prefix="bench_crawl_prio_")
    try:
        eng = CrawlEngine(
            spark, pages, model, workdir,
            EngineConfig(budget_per_host=6000, salt_buckets=0,
                         use_bloom=False, priority_mode=True),
            host_trust=trust_df,
        )
        t0 = time.monotonic()
        res_p = eng.run(
            [f"http://{cfg.host(k)}/" for k in range(cfg.n_hosts)]
        )
        crawl_prio_sec = time.monotonic() - t0
        fetched_p = res_p.order.filter("fetched").count()
        assert fetched_p == fetched
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    # noise-normalized metric: crawl time in units of the fixed-cost
    # Spark calib kernel. A slow VM phase inflates numerator and
    # denominator together, so this ratio is comparable ACROSS rounds
    # even when wall-clock is not (BASELINE.md documents the clean-phase
    # calib ≈ 0.6 s; ratio ≈ crawl_sec/0.6 on a clean box).
    calib_med = sorted(calib["spark_sec"])[len(calib["spark_sec"]) // 2]
    return {
        "calib": calib,
        "calib_spark_med": calib_med,
        "crawl_calib_ratio": round(crawl_sec / calib_med, 1),
        "dedup_ops_per_sec": round(n_cand / dedup_sec),
        "dedup_sec": round(dedup_sec, 3),
        "dedup_bloom_ops_per_sec": round(n_cand / bloom_sec),
        "dedup_bloom_sec": round(bloom_sec, 3),
        "fetched_urls_per_sec": round(fetched / crawl_sec),
        "crawl_sec": round(crawl_sec, 3),
        "crawl_priority_sec": round(crawl_prio_sec, 3),
        "priority_overhead_ratio": round(crawl_prio_sec / crawl_sec, 2),
        "crawl_sec_runs": [round(r[0], 3) for r in runs],
        "crawl_rounds": rounds,
        "fetched": fetched,
        "site_pages": total_pages,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = spark_session(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    queries, suite_calib = bench_queries(spark, sf_dir)
    crawl = bench_crawl(spark)
    total = round(time.monotonic() - t0, 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    calib_med = sorted(suite_calib)[len(suite_calib) // 2]
    print(
        json.dumps(
            {
                "metric": "suite_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                # the frozen 20-query basket: the ONE number to compare
                # round over round (suite_sec moves when HEADLINE grows)
                "suite20_sec": round(
                    sum(queries[q] for q in SUITE20), 3
                ),
                "suite_calib_spark_sec": suite_calib,
                "suite_calib_ratio": round(
                    sum(queries.values()) / calib_med, 1
                ),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "crawl": crawl,
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
