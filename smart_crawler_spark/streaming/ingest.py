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
        # IDEMPOTENT per-batch sinks: each micro-batch overwrites its
        # own batch=<id> partition, so a Structured Streaming replay of
        # a half-committed batch rewrites the same directories instead
        # of appending duplicates (the standard foreachBatch exactly-
        # once pattern for non-transactional sinks). The seen read
        # excludes the replaying batch's own partition — otherwise a
        # crash after both writes but before the checkpoint commit
        # would anti-join the replay against its own output and
        # overwrite the partition with empty data.
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
            seen = spark.read.parquet(seen_dir)
            if "batch" in seen.columns:
                seen = seen.filter(F.col("batch") != batch_id)
            seen = seen.select("url_hash")
        except Exception:  # first batch: no seen snapshot yet
            seen = spark.createDataFrame([], "url_hash long")
        new = enriched.join(seen, "url_hash", "left_anti").persist()
        try:
            new.select(
                "url", "host", "page_class", "class_depth", "class_name",
                "form_params", "url_hash",
            ).write.mode("overwrite").parquet(f"{frontier_out}/batch={batch_id}")
            new.select("url_hash").write.mode("overwrite").parquet(
                f"{seen_dir}/batch={batch_id}"
            )
        finally:
            new.unpersist()

    return (
        candidates.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def host_rate_state(candidates: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): a
    per-host crawl-rate tracker that no built-in aggregation expresses —
    cumulative URL count, first/last event time, and the running mean
    inter-arrival gap, carried ACROSS micro-batches in typed state and
    emitted in update mode per batch.

    This is the streaming analog of the engine's host_stats table: at a
    live deployment it drives adaptive politeness (hosts whose arrival
    gap collapses get their F4 budget tightened). State per host is four
    scalars — O(hosts) memory, partitioned by the shuffle on host.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "host string, n_urls long, first_ts timestamp, last_ts timestamp,"
        " mean_gap_s double"
    )
    state_schema = "n long, first_ts double, last_ts double, gap_sum double"

    def update(key, pdfs, state: GroupState):
        (host,) = key
        ts: list[float] = []
        for pdf in pdfs:
            ts.extend(
                pd.to_datetime(pdf["event_ts"]).astype("int64") / 1e9
            )
        ts.sort()
        if state.exists:
            n, first_ts, last_ts, gap_sum = state.get
        else:
            n, first_ts, last_ts, gap_sum = 0, None, None, 0.0
        for t in ts:
            if last_ts is not None:
                gap_sum += t - last_ts
            if first_ts is None:
                first_ts = t
            last_ts = t
            n += 1
        state.update((n, first_ts, last_ts, gap_sum))
        mean_gap = gap_sum / (n - 1) if n > 1 else None
        yield pd.DataFrame(
            {
                "host": [host],
                "n_urls": [n],
                "first_ts": [pd.Timestamp(first_ts, unit="s")],
                "last_ts": [pd.Timestamp(last_ts, unit="s")],
                "mean_gap_s": [mean_gap],
            }
        )

    enriched = candidates.withColumn("host", url_host(F.col("url")))
    return enriched.groupBy("host").applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
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


def session_stats(
    candidates: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming SESSION windows per host (session_window: dynamic-gap
    event-time sessions, the stateful operator behind per-host crawl
    burst detection). Sessions merge across micro-batches through the
    state store — an event within ``gap`` of a still-open session
    extends it — and append mode emits a session only once the
    watermark passes its end, so each (host, session) row is final.
    Late events below the watermark are dropped, same contract as
    ``url_arrival_stats``. Epoch-second columns keep the gate
    timezone-proof."""
    return (
        candidates.withColumn("host", url_host(F.col("url")))
        .withWatermark("event_ts", watermark)
        .groupBy(F.session_window("event_ts", gap).alias("sw"), "host")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "host",
            F.col("sw.start").cast("long").alias("sess_start_s"),
            F.col("sw.end").cast("long").alias("sess_end_s"),
            "n_events",
        )
    )


RESPONSE_SCHEMA = "url string, status int, event_ts timestamp"


def read_response_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of fetch responses (one JSON object per line)."""
    return (
        spark.readStream.schema(RESPONSE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(path)
    )


def fetch_latency_join(
    dispatches: DataFrame,
    responses: DataFrame,
    max_latency: str = "5 minutes",
    watermark: str = "2 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join of fetch DISPATCHES with fetch
    RESPONSES on url, bounded by event time: a response joins its
    dispatch only if it lands within ``max_latency`` of the dispatch.
    This is the canonical two-stream watermarked join (the
    impression-click shape), in crawl terms: per-fetch latency
    attribution without ever materializing either stream.

    Engine semantics the gate pins down (StreamingSymmetricHashJoin):
    - matches EMIT immediately in the micro-batch where the second row
      arrives — inner joins never wait for the watermark;
    - dispatch state is evicted once the watermark passes
      ``dispatch_ts + max_latency`` (the row can no longer match), so a
      response arriving after that is droppable on input — its own
      event time is below the response-side state watermark — and
      deterministically produces nothing;
    - the time-range condition runs inside the join, so an
      out-of-bound response (latency > ``max_latency``) is excluded
      even when both rows share a micro-batch;
    - ``how='left_outer'`` adds the TIMEOUT path: a dispatch that never
      got an in-bound response emits one null-response row exactly when
      its state is evicted (the engine tracks per-row matched flags, so
      a dispatch matched earlier never re-emits as null) — fetch-
      timeout detection without ever materializing the streams.

    Epoch-second output columns keep the oracle timezone-proof."""
    d = dispatches.select(
        "url", F.col("event_ts").alias("dispatch_ts")
    ).withWatermark("dispatch_ts", watermark)
    r = responses.select(
        F.col("url").alias("r_url"),
        "status",
        F.col("event_ts").alias("response_ts"),
    ).withWatermark("response_ts", watermark)
    return (
        d.join(
            r,
            (d.url == r.r_url)
            & (r.response_ts >= d.dispatch_ts)
            & (
                r.response_ts
                <= d.dispatch_ts + F.expr(f"INTERVAL {max_latency}")
            ),
            how,
        )
        .select(
            "url",
            url_host(F.col("url")).alias("host"),
            F.col("dispatch_ts").cast("long").alias("dispatch_s"),
            F.col("response_ts").cast("long").alias("response_s"),
            (
                F.col("response_ts").cast("long")
                - F.col("dispatch_ts").cast("long")
            ).alias("latency_s"),
            "status",
        )
    )


def enrich_with_static(
    candidates: DataFrame, host_profile: DataFrame
) -> DataFrame:
    """Stream-static LEFT join: every streaming candidate is enriched
    with its host's profile row (crawl priority class, robots policy,
    quality prior — whatever the profile table carries) inside the
    micro-batch, no state store and no watermark required — Spark
    re-plans the static side per batch, so a refreshed profile
    snapshot is picked up at the next trigger. The static side is a
    per-host dimension (bounded by distinct hosts), so the join
    broadcasts; a host absent from the profile keeps null columns
    (left semantics) rather than dropping the candidate."""
    c = candidates.withColumn("host", url_host(F.col("url")))
    return c.join(F.broadcast(host_profile), "host", "left").select(
        "url",
        "host",
        F.col("event_ts").cast("long").alias("ts_s"),
        *[col for col in host_profile.columns if col != "host"],
    )


def dedup_within_watermark(
    candidates: DataFrame, delay: str = "2 minutes"
) -> DataFrame:
    """Bounded-state streaming URL dedup via
    ``dropDuplicatesWithinWatermark``: a URL re-arriving within
    ``delay`` of its first sighting is dropped; once the watermark
    passes the first sighting's event time the key's state is evicted,
    so a much-later re-arrival is EMITTED AGAIN. That bounded-state
    contract is the streaming twin of the frontier's recrawl-expiry
    semantics (frontier/cuckoo.py deletes): state size is O(URLs per
    watermark window), never O(all URLs ever seen) — the property that
    lets the operator run forever at frontier scale while the exact
    seen-set lives in the snapshot table (foreachBatch path).

    Emission is pass-through (append mode, no buffering); late rows
    below the watermark are dropped on input. Epoch-second output."""
    return (
        candidates.withWatermark("event_ts", delay)
        .dropDuplicatesWithinWatermark(["url"])
        .select(
            "url",
            url_host(F.col("url")).alias("host"),
            F.col("event_ts").cast("long").alias("ts_s"),
        )
    )


def start_image_ingest(
    images: DataFrame,
    ledger_dir: str,
    checkpoint_dir: str,
    min_w: int = 48,
    min_h: int = 40,
    min_words: int = 4,
) -> StreamingQuery:
    """Streaming image+caption ingestion: per micro-batch the caption
    gate (operators/images.py caption_gate, header-only dims) drops
    unusable rows, the survivors collapse to per-content partial
    aggregates — content = md5 of the payload bytes, carrying the min
    numeric image id and the copy count — and each batch overwrites its
    OWN ledger partition (idempotent replay, same foreachBatch pattern
    as start_frontier_ingest). The ledger merge is MONOTONE: min is
    arrival-order-free and the per-batch partition overwrite makes the
    sums replay-safe, so the final dedup decision (read_image_ledger)
    is identical under any micro-batch split, arrival order, or
    restart point — the property a resumable ingest needs. A live
    deployment periodically compacts old batch partitions into one
    snapshot; the merge is the same single groupBy either way."""
    from smart_crawler_spark.operators.images import caption_gate

    def process(batch_df: DataFrame, batch_id: int) -> None:
        gated = caption_gate(
            batch_df.withColumn("content", F.md5(F.col("bytes"))),
            min_w=min_w,
            min_h=min_h,
            min_words=min_words,
            passthrough=("content",),
        ).filter("keep")
        iid = F.regexp_extract("image_id", r"(\d+)$", 1).cast("long")
        part = (
            gated.select("content", iid.alias("iid"))
            .groupBy("content")
            .agg(
                F.min("iid").alias("iid"),
                F.count(F.lit(1)).alias("n_copies"),
            )
        )
        part.write.mode("overwrite").parquet(
            f"{ledger_dir}/batch={batch_id}"
        )

    return (
        images.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_image_ledger(spark: SparkSession, ledger_dir: str) -> DataFrame:
    """The merged content ledger: one row per distinct payload that
    passed the gate, labelled with its canonical (minimum) image id and
    total copies observed across every micro-batch."""
    led = spark.read.parquet(ledger_dir)
    return led.groupBy("content").agg(
        F.min("iid").alias("iid"),
        F.sum("n_copies").cast("long").alias("n_copies"),
    )
