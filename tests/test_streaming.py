"""Structured Streaming frontier ingestion: micro-batch dedup shares F1
semantics; watermarked arrival stats run as a streaming aggregation."""

import json

from smart_crawler_spark.streaming.ingest import (
    host_rate_state,
    read_candidate_stream,
    start_frontier_ingest,
    url_arrival_stats,
)


def _write_batch(path, rows, name):
    with open(f"{path}/{name}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _cand(url, ts="2024-01-01T00:00:05"):
    return {
        "url": url,
        "page_class": "detail",
        "class_depth": 2,
        "form_params": None,
        "event_ts": ts,
    }


def test_streaming_ingest_dedups_across_batches(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    seen_dir = str(tmp_path / "seen")
    frontier = str(tmp_path / "frontier")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(src, [_cand("http://h.test/a"), _cand("http://h.test/b")], "b1")
    q = start_frontier_ingest(
        read_candidate_stream(spark, str(src)), seen_dir, frontier, ckpt
    )
    q.awaitTermination(120)

    # second wave: one dup (fragment variant — stripped by E9), one new
    _write_batch(src, [_cand("http://h.test/a#frag"), _cand("http://h.test/c")], "b2")
    q = start_frontier_ingest(
        read_candidate_stream(spark, str(src)), seen_dir, frontier, ckpt
    )
    q.awaitTermination(120)

    got = sorted(r["url"] for r in spark.read.parquet(frontier).collect())
    assert got == ["http://h.test/a", "http://h.test/b", "http://h.test/c"]
    assert spark.read.parquet(seen_dir).distinct().count() == 3


def test_arrival_stats_schema(spark, tmp_path):
    src = tmp_path / "in2"
    src.mkdir()
    _write_batch(
        src,
        [_cand(f"http://h{i % 2}.test/p{i}", "2024-01-01T00:00:30") for i in range(6)],
        "b1",
    )
    stream = read_candidate_stream(spark, str(src))
    stats = url_arrival_stats(stream)
    q = (
        stats.writeStream.format("memory")
        .queryName("arrivals")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; schema + run are
    # the contract here (single batch -> windows still open -> 0 rows ok)
    df = spark.sql("select * from arrivals")
    assert set(df.columns) == {"start", "end", "host", "n_urls"}


def test_host_rate_state_carries_across_batches(spark, tmp_path):
    """applyInPandasWithState: typed per-host state survives micro-batch
    boundaries — the second batch's emission continues the first's
    counters and the mean inter-arrival gap spans both."""
    src = tmp_path / "in3"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt3")
    out_rows = []

    def run_wave():
        stream = read_candidate_stream(spark, str(src))
        q = (
            host_rate_state(stream)
            .writeStream.foreachBatch(
                lambda df, _id: out_rows.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_batch(
        src,
        [
            _cand("http://h0.test/a", "2024-01-01T00:00:00"),
            _cand("http://h0.test/b", "2024-01-01T00:00:10"),
        ],
        "b1",
    )
    run_wave()
    _write_batch(
        src,
        [_cand("http://h0.test/c", "2024-01-01T00:00:40")],
        "b2",
    )
    run_wave()

    h0 = [r for r in out_rows if r["host"] == "h0.test"]
    assert [r["n_urls"] for r in h0] == [2, 3]  # cumulative, not per-batch
    # gaps: 10s (batch 1), then (10 + 30) / 2 spanning the boundary
    assert h0[0]["mean_gap_s"] == 10.0
    assert h0[1]["mean_gap_s"] == 20.0


def test_image_ingest_ledger_batch_split_independent(spark, tmp_path):
    """The merged content ledger must be identical whether the corpus
    arrives as ONE micro-batch or many — the monotone-merge property
    the operator claims."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.streaming.ingest import (
        read_image_ledger,
        start_image_ingest,
    )

    corpus = generate_images(
        spark, 60, jpeg_every=10, dup_every=6, short_caption_every=5
    )
    results = {}
    for tag, files_per_trigger, parts in (
        ("one", 100, 6),
        ("many", 1, 6),
    ):
        base = tmp_path / tag
        corpus.repartition(parts).write.mode("overwrite").parquet(
            str(base / "drop")
        )
        stream = (
            spark.readStream.schema(corpus.schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(str(base / "drop"))
        )
        q = start_image_ingest(
            stream,
            ledger_dir=str(base / "ledger"),
            checkpoint_dir=str(base / "ckpt"),
        )
        q.awaitTermination()
        led = read_image_ledger(spark, str(base / "ledger"))
        results[tag] = {
            (r["content"], r["iid"], r["n_copies"]) for r in led.collect()
        }
    assert results["one"] == results["many"]
    # plant rule: kept contents are ci with dims+caption pass
    kept_ids = {iid for _, iid, _ in results["one"]}
    want = {
        ci
        for ci in {i - 1 if i % 6 == 5 else i for i in range(60)}
        if ci % 4 != 0 and ci % 3 != 0 and ci % 5 != 4
    }
    assert kept_ids == want


def _resp(url, status, ts):
    return {"url": url, "status": status, "event_ts": ts}


def test_fetch_join_bounds_and_cross_batch_state(spark, tmp_path):
    """Stream-stream join semantics the entry gate relies on: in-bound
    pairs emit immediately, out-of-bound (latency > 5 min) pairs never
    emit, a wave-2 response joins a wave-1 dispatch through the state
    store, and a wave-2 response below the watermark whose dispatch was
    evicted produces nothing."""
    from smart_crawler_spark.streaming.ingest import (
        fetch_latency_join,
        read_response_stream,
    )

    disp = tmp_path / "disp"
    resp = tmp_path / "resp"
    disp.mkdir()
    resp.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def m(minute):  # minute -> ISO event_ts on a fixed date
        return f"2024-03-01T00:{minute:02d}:00"

    def run_wave():
        q = (
            fetch_latency_join(
                read_candidate_stream(spark, str(disp)),
                read_response_stream(spark, str(resp)),
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # wave 1: dispatches at 0 and 9; responses in-bound for /fast,
    # out-of-bound (+7) for /slow; a max-minute-17 response row pushes
    # the committed watermark to min(9, 17) - 2 = 7
    _write_batch(
        disp,
        [
            _cand("http://h.test/old", m(0)),
            _cand("http://h.test/open", m(9)),
            _cand("http://h.test/fast", m(9)),
        ],
        "d1",
    )
    _write_batch(
        resp,
        [
            _resp("http://h.test/fast", 200, m(10)),  # latency 1: join
            _resp("http://h.test/old", 200, m(7)),  # latency 7: no join
            _resp("http://x.test/none", 200, m(17)),  # watermark pusher
        ],
        "r1",
    )
    run_wave()
    got1 = {
        (r["url"], r["latency_s"], r["status"])
        for r in spark.read.parquet(out).collect()
    }
    assert got1 == {("http://h.test/fast", 60, 200)}

    # wave 2: /open's dispatch (minute 9; evictable only past 14) is
    # still in state -> its minute-11 response joins cross-batch; /old's
    # dispatch (minute 0; evictable past 5 < watermark 7) is gone and
    # the minute-3 response is below the watermark -> nothing
    _write_batch(
        resp,
        [
            _resp("http://h.test/open", 404, m(11)),
            _resp("http://h.test/old", 200, m(3)),
        ],
        "r2",
    )
    run_wave()
    got2 = {
        (r["url"], r["latency_s"], r["status"])
        for r in spark.read.parquet(out).collect()
    }
    assert got2 == {
        ("http://h.test/fast", 60, 200),
        ("http://h.test/open", 120, 404),
    }


def test_fetch_join_left_outer_timeout_flush(spark, tmp_path):
    """Left-outer: an unmatched dispatch emits ONE null-response row
    when the watermark evicts its state (via the trailing no-data
    batch); a matched dispatch never re-emits as null."""
    from smart_crawler_spark.streaming.ingest import (
        fetch_latency_join,
        read_response_stream,
    )

    disp = tmp_path / "disp"
    resp = tmp_path / "resp"
    disp.mkdir()
    resp.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def m(minute):
        return f"2024-03-01T{minute // 60:02d}:{minute % 60:02d}:00"

    def run_wave():
        q = (
            fetch_latency_join(
                read_candidate_stream(spark, str(disp)),
                read_response_stream(spark, str(resp)),
                how="left_outer",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_batch(
        disp,
        [_cand("http://h.test/hit", m(0)), _cand("http://h.test/miss", m(1))],
        "d1",
    )
    _write_batch(resp, [_resp("http://h.test/hit", 200, m(2))], "r1")
    run_wave()
    got1 = {(r["url"], r["status"]) for r in spark.read.parquet(out).collect()}
    assert got1 == {("http://h.test/hit", 200)}

    # closers at minute 60 -> watermark 58 -> /miss (1+5 < 58) flushes
    # as a timeout row; /hit does not re-emit; closers stay open
    _write_batch(disp, [_cand("http://c.test/d", m(60))], "d2")
    _write_batch(resp, [_resp("http://c.test/r", 200, m(60))], "r2")
    run_wave()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2
    miss = [r for r in rows if r["url"] == "http://h.test/miss"][0]
    assert miss["status"] is None and miss["latency_s"] is None
