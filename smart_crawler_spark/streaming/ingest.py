"""Structured Streaming frontier ingestion.

The reference is a batch actor pipeline with **no** streaming operators
(SURVEY §2 end note); this module is the Spark-native extension for the
continuous-crawl deployment shape: candidate URLs arrive as files
(or Kafka at a real site), are canonicalized + hashed with the same
native expressions as the batch path, deduped against the engine's seen
snapshot INSIDE ``foreachBatch`` (so each micro-batch shares the exact
F1 semantics), and appended to the frontier directory the batch engine
reads. Event-time windowed URL-arrival stats come from a watermarked
window aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from smart_crawler_spark.frontier.canonical import url_host, url_seen_key

CANDIDATE_SCHEMA = (
    "url string, page_class string, class_depth int, form_params string,"
    " event_ts timestamp"
)


def read_candidate_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of candidate URLs (one JSON object per line)."""
    return (
        spark.readStream.schema(CANDIDATE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(path)
    )


def start_frontier_ingest(
    candidates: DataFrame,
    seen_dir: str,
    frontier_out: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Dedup each micro-batch against the persisted seen snapshot and
    append new URLs to the frontier sink. foreachBatch keeps the exact
    anti-join semantics of the batch engine (F1) per micro-batch."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        enriched = (
            batch_df.withColumn("host", url_host(F.col("url")))
            .withColumn(
                "url_hash", url_seen_key(F.col("url"), F.col("form_params"))
            )
            .withColumn("class_name", F.col("page_class"))
            .dropDuplicates(["url_hash"])
        )
        try:
            seen = spark.read.parquet(seen_dir).select("url_hash")
        except Exception:  # first batch: no seen snapshot yet
            seen = spark.createDataFrame([], "url_hash long")
        new = enriched.join(seen, "url_hash", "left_anti")
        new.select(
            "url", "host", "page_class", "class_depth", "class_name",
            "form_params", "url_hash",
        ).write.mode("append").parquet(frontier_out)
        new.select("url_hash").write.mode("append").parquet(seen_dir)

    return (
        candidates.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def url_arrival_stats(candidates: DataFrame, window: str = "1 minute") -> DataFrame:
    """Watermarked event-time window aggregation of URL arrivals per
    host (late data beyond 2 windows dropped)."""
    return (
        candidates.withColumn("host", url_host(F.col("url")))
        .withWatermark("event_ts", "2 minutes")
        .groupBy(F.window("event_ts", window).alias("w"), "host")
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .select("w.start", "w.end", "host", "n_urls")
    )
