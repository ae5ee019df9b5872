"""10^9/10^10-geometry URL-seen evidence (north_rule: 10^10 frontier).

Measures the seen-filter's exact and bloom-cogroup paths with
|seen| = SEEN_KEYS (default 1e9) against a CAND_KEYS-candidate batch at
an adversarial 50%-seen mix, and prints ONE JSON line with cand/s, the
per-shard memory ledger, and — when TASK_STATS=1 — per-stage TASK-TIME
quantiles from the Spark REST API. The design property the numbers
evidence is shard ownership: every path (build, merge, probe, exact
anti-join) touches a key only inside its `pmod(url_hash, shards)`
partition, so scale-out adds shards, never widens any single task.

The 10^10 claim is measured (not just arithmetic) by running the
PER-SHARD GEOMETRY of the production layout at two total scales:
10^10 keys / 4096 shards = 2.44M keys/shard, so

    SEEN_KEYS=1e9 SHARDS=410 TASK_STATS=1 python scripts/seen_scale.py
    SEEN_KEYS=2e9 SHARDS=820 TASK_STATS=1 python scripts/seen_scale.py

hold keys/shard at 2.44M while total keys double: flat per-task time
quantiles between the two runs are exactly the "adding shards, never
widening tasks" property the 4096-shard 10^10 layout rests on. (The
disk ceiling on this box — ~70 GB free, random 8-byte keys are
incompressible, and probe shuffles transiently double the footprint —
caps the run at 2e9 total keys; the geometry, not the total, is what
the claim needs.)

Usage:  python scripts/seen_scale.py            # 1e9 keys, ~10 min
        SEEN_KEYS=1e8 python scripts/seen_scale.py   # smaller rehearsal
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from smart_crawler_spark.frontier.dedup import BloomConfig, SeenFilter  # noqa: E402
from smart_crawler_spark.session import spark_session  # noqa: E402


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def task_stats(spark, since_ms: float, top_n: int = 3) -> list[dict]:
    """Per-task executorRunTime quantiles of the heaviest completed
    stages submitted after ``since_ms`` (epoch millis) — the per-shard
    task-width evidence. Uses the REST API so the numbers are Spark's
    own task accounting, not wall-clock inference."""
    stages = [
        s
        for s in _rest(spark, "/stages?status=complete")
        if s.get("firstTaskLaunchedTime")
        and _ts(s["submissionTime"]) >= since_ms
    ]
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    out = []
    for s in stages[:top_n]:
        q = _rest(
            spark,
            f"/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
            "?quantiles=0.5,0.95,1.0",
        )
        out.append(
            {
                "stage": s["stageId"],
                "name": s.get("name", "")[:60],
                "tasks": s["numCompleteTasks"],
                "task_ms_p50": round(q["executorRunTime"][0]),
                "task_ms_p95": round(q["executorRunTime"][1]),
                "task_ms_max": round(q["executorRunTime"][2]),
                "stage_cpu_sec": round(s["executorRunTime"] / 1000, 1),
            }
        )
    return out


def _ts(iso: str) -> float:
    from datetime import datetime

    return datetime.strptime(iso, "%Y-%m-%dT%H:%M:%S.%fGMT").timestamp() * 1000


def main() -> None:
    n_seen = int(float(os.environ.get("SEEN_KEYS", "1e9")))
    n_cand = int(float(os.environ.get("CAND_KEYS", "2e8")))
    runs = int(os.environ.get("RUNS", "1"))
    shards = int(os.environ.get("SHARDS", "256"))
    bits_per_shard = 1 << int(os.environ.get("SHARD_BITS_LOG2", "25"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    want_stats = os.environ.get("TASK_STATS") == "1"
    spark = spark_session(
        app_name="seen-scale",
        master=f"local[{cpus}]",
        shuffle_partitions=shards,
        extra_conf={
            # the seen table lives on disk (parquet) like the production
            # Iceberg layout, so the heap only carries shuffle state; an
            # 80g heap + a 1e9-row deserialized checkpoint OOM-killed the
            # JVM on this 125 GiB box
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
            "spark.local.dir": "/tmp/spark-seen-scale",
            # REST task metrics for the per-shard task-width ledger
            "spark.ui.enabled": "true" if want_stats else "false",
            "spark.ui.retainedStages": "200",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    key = lambda c: F.xxhash64(F.concat(F.lit("u"), c))  # noqa: E731
    seen_keys = spark.range(n_seen).select(key(F.col("id")).alias("url_hash"))
    # 50%-seen candidate mix: ids straddling the seen range boundary
    cand = spark.range(n_seen - n_cand // 2, n_seen + n_cand // 2).select(
        F.col("id"), key(F.col("id")).alias("url_hash")
    )
    want_new = n_cand // 2

    out = {
        "seen_keys": n_seen,
        "cand_keys": n_cand,
        "seen_mix": 0.5,
        "cpus": int(cpus),
    }

    # --- exact sharded anti-join ---------------------------------------
    # shard count must match the bloom config below: the stored shard
    # column IS the cogroup key for both paths
    filt = SeenFilter(spark, BloomConfig(shards=shards), use_bloom=False)
    t0 = time.monotonic()
    # bulk load to PARQUET (ids are unique by construction, so add()'s
    # idempotence anti-join + distinct would only add two full-table
    # shuffles): at 10^9+ keys the seen table is disk-backed table
    # storage — the 10^10 production layout (Iceberg) — not an in-memory
    # checkpoint; probes are column-pruned scans of it
    seen_path = "/tmp/spark-seen-scale/seen_parquet"
    # REUSE_SEEN=1 resumes a run that died after the build phase: the
    # parquet layout is deterministic in (SEEN_KEYS, SHARDS), so a table
    # left on disk by the interrupted run is byte-identical to a rebuild
    if os.environ.get("REUSE_SEEN") == "1" and os.path.exists(
        seen_path + "/_SUCCESS"
    ):
        out["seen_build_sec"] = None
    else:
        (
            filt._with_shard(seen_keys)
            .select("url_hash", "shard")
            .write.mode("overwrite")
            .parquet(seen_path)
        )
        out["seen_build_sec"] = round(time.monotonic() - t0, 1)
    filt.seen = spark.read.parquet(seen_path)
    if os.environ.get("SKIP_EXACT") != "1":
        best = None
        t_probe0 = time.time() * 1000
        for _ in range(runs):
            t0 = time.monotonic()
            n_new = filt.filter_new(cand).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        assert n_new == want_new, (n_new, want_new)
        out["exact"] = {
            "sec": round(best, 2),
            "cand_per_sec": round(n_cand / best),
        }
        if want_stats:
            out["exact"]["task_stats"] = task_stats(spark, t_probe0)
    print("PARTIAL " + json.dumps(out), flush=True)

    # --- bloom-cogroup prefilter (the 10^10 layout) --------------------
    cfg = BloomConfig(
        shards=shards, bits_per_shard=bits_per_shard, num_hashes=5
    )
    bfilt = SeenFilter(spark, cfg, use_bloom=True, lazy=True)
    bfilt.seen = filt.seen  # reuse the materialized seen table
    t0 = time.monotonic()
    bfilt.activate_blooms()  # one bulk build from the seen table
    out["bloom_build_sec"] = round(time.monotonic() - t0, 1)
    total_bytes = shards * cfg.blob_bytes()
    assert total_bytes > bfilt.BROADCAST_BLOOM_MAX_BYTES  # cogroup path
    best = None
    t_probe0 = time.time() * 1000
    for _ in range(runs):
        t0 = time.monotonic()
        n_new_b = bfilt.filter_new(cand).count()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    assert n_new_b == want_new, (n_new_b, want_new)
    out["bloom_cogroup"] = {
        "sec": round(best, 2),
        "cand_per_sec": round(n_cand / best),
    }
    if want_stats:
        out["bloom_cogroup"]["task_stats"] = task_stats(spark, t_probe0)
    out["memory"] = {
        "shards": shards,
        "bitmap_mib_per_shard": round(cfg.blob_bytes() / (1 << 20), 2),
        "bitmap_total_gib": round(total_bytes / (1 << 30), 2),
        "keys_per_shard": n_seen // shards,
        "bits_per_key": round(bits_per_shard * shards / n_seen, 2),
    }
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
