"""Bucketed-table layout for co-located joins (the 100 TB story made
runnable).

At production scale the two biggest shuffles in the crawl loop are on
the same key every round: the seen-set anti-join (frontier/dedup.py) and
the per-host frontier operations both hash on a stable key. Persisting
those tables bucketed by that key means every subsequent join /
aggregation on the key is satisfied by the scan's output partitioning —
Catalyst plans NO Exchange on the bucketed side (pinned by
tests/test_bucketed.py). On Iceberg the same layout is the
``bucket(N, key)`` partition transform; here it is Spark native
bucketing, which works against the session catalog and parquet files.

Usage pattern (the seen table at 10^10 keys):

    write_bucketed(seen_df, "seen", key="url_hash", n_buckets=256,
                   database="crawlstate", location=workdir)
    seen = spark.table("crawlstate.seen")
    new = candidates.join(seen, "url_hash", "left_anti")   # no Exchange
                                                           # on seen side

Bucket counts should match between tables joined together (Spark joins
bucketed tables shuffle-free only when both sides have the same bucket
count, or one side's count divides the other's with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_database(
    spark: SparkSession, database: str, location: str | None = None
) -> None:
    """Create ``database`` if missing, optionally rooted at ``location``
    (keeps table files out of the default ./spark-warehouse)."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}{loc}")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    database: str | None = None,
    location: str | None = None,
    sort: bool = True,
) -> str:
    """Persist ``df`` as a parquet table bucketed (and by default
    sorted) by ``key``. Returns the qualified table name.

    Sorting within buckets additionally lets sort-merge joins skip the
    per-task sort and enables min/max row-group skipping on the key."""
    spark = df.sparkSession
    keys = [key] if isinstance(key, str) else list(key)
    if database:
        ensure_database(spark, database, location)
        qualified = f"{database}.{table}"
    else:
        qualified = table
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, keys[0], *keys[1:])
    )
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    w.saveAsTable(qualified)
    return qualified


def bucket_spec(spark: SparkSession, qualified_table: str) -> dict:
    """Introspect a table's bucketing (n_buckets, bucket_cols) from the
    catalog — empty dict when the table isn't bucketed."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {qualified_table}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    if "Num Buckets" not in info:
        return {}
    return {
        "n_buckets": int(info["Num Buckets"]),
        "bucket_cols": info.get("Bucket Columns", ""),
        "sort_cols": info.get("Sort Columns", ""),
    }
