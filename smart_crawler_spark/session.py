"""SparkSession factory.

One place to configure the session so tests, bench.py and the driver
contract all run with identical semantics:

- Arrow enabled (all row-level compute goes through pandas/Arrow UDFs,
  never row-at-a-time Python — input_hint requirement).
- AQE on (runtime coalescing + skew-join handling; at 100 TB the skewed
  per-host frontier partitions get split automatically).
- UTC session timezone (duckdb oracle comparison — duckdb timestamps are
  UTC-naive).
- shuffle partitions sized to cores for local mode; on a real cluster
  this is overridden by spark-submit conf (AQE coalesces anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def spark_session(
    app_name: str = "smart-crawler-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[6:-1]
            shuffle_partitions = 32 if inner == "*" else max(int(inner), 4)
        else:
            shuffle_partitions = 200

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # binary image payloads can make individual rows large; keep the
        # broadcast threshold explicit so dimension tables (model, seeds)
        # broadcast but page corpora never do.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
