"""10^9-key URL-seen evidence (north_rule: 10^10-URL frontier).

Measures the seen-filter's exact and bloom-cogroup paths with
|seen| = 1e9 keys (overridable) against a 2e8-candidate batch at an
adversarial 50%-seen mix, and prints ONE JSON line with cand/s plus the
per-shard memory ledger. The 10^10 extrapolation arithmetic lives in
BASELINE.md next to the recorded rows — the design property that makes
it valid is shard ownership: every path (build, merge, probe, exact
anti-join) touches a key only inside its `pmod(url_hash, shards)`
partition, so scale-out adds shards, never widens any single task.

Usage:  python scripts/seen_scale.py            # 1e9 keys, ~10 min
        SEEN_KEYS=1e8 python scripts/seen_scale.py   # smaller rehearsal
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from smart_crawler_spark.frontier.dedup import BloomConfig, SeenFilter  # noqa: E402
from smart_crawler_spark.session import spark_session  # noqa: E402


def main() -> None:
    n_seen = int(float(os.environ.get("SEEN_KEYS", "1e9")))
    n_cand = int(float(os.environ.get("CAND_KEYS", "2e8")))
    runs = int(os.environ.get("RUNS", "1"))
    shards = int(os.environ.get("SHARDS", "256"))
    bits_per_shard = 1 << int(os.environ.get("SHARD_BITS_LOG2", "25"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
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
    (
        filt._with_shard(seen_keys)
        .select("url_hash", "shard")
        .write.mode("overwrite")
        .parquet(seen_path)
    )
    filt.seen = spark.read.parquet(seen_path)
    out["seen_build_sec"] = round(time.monotonic() - t0, 1)
    best = None
    for _ in range(runs):
        t0 = time.monotonic()
        n_new = filt.filter_new(cand).count()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    assert n_new == want_new, (n_new, want_new)
    out["exact"] = {"sec": round(best, 2), "cand_per_sec": round(n_cand / best)}
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
