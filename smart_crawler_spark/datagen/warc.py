"""Deterministic WARC shard corpus: every record's URL, status and
payload are pure functions of its global index, so the DuckDB oracle
can state the parsed-record table over ``range()`` without reading a
byte. Generation is distributed (range -> mapInPandas), one shard per
row, real per-record-gzip WARC bytes (functions/warc.py)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from smart_crawler_spark.functions.warc import encode_warc_records

SHARDS_SCHEMA = "shard_id string, bytes binary"


def warc_record_rule(i: int) -> dict:
    """The generation rule for global record index ``i`` (mirrored by
    the oracle SQL): url/status/payload all derive from ``i``."""
    return {
        "url": f"http://h{i % 7}.test/p/{i}",
        "status": 404 if i % 11 == 3 else 200,
        "payload": (f"page {i} body " * (i % 4 + 1)).encode(),
    }


def warc_revisit_rule(i: int, revisit_every: int) -> dict:
    """Record rule with planted revisit records (WARC 1.1 §6.7, the
    CommonCrawl storage-dedup layout): every ``revisit_every``-th index
    is a RE-FETCH of its block anchor ``b = i - i % revisit_every``
    that found unchanged content — stored payload-free, carrying the
    anchor's payload digest and a WARC-Refers-To-Target-URI pointing at
    the original capture. A 404 anchor produces no revisit (there is
    no stored content to deduplicate against), so that index stays a
    plain response row."""
    import hashlib

    b = i - i % revisit_every
    if i % revisit_every == revisit_every - 1 and b != i and b % 11 != 3:
        orig = warc_record_rule(b)
        return {
            "url": orig["url"],
            "status": 200,
            "payload": b"",
            "warc_type": "revisit",
            "digest": "md5:" + hashlib.md5(orig["payload"]).hexdigest(),
            "refers_to": orig["url"],
        }
    return warc_record_rule(i)


def generate_warc_shards(
    spark: SparkSession,
    n_shards: int,
    recs_per_shard: int,
    compress: bool = True,
    revisit_every: int = 0,
) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for s in pdf["id"]:
                s = int(s)
                recs = [
                    warc_revisit_rule(
                        s * recs_per_shard + j, revisit_every
                    )
                    if revisit_every
                    else warc_record_rule(s * recs_per_shard + j)
                    for j in range(recs_per_shard)
                ]
                rows.append(
                    {
                        "shard_id": f"s{s}",
                        "bytes": encode_warc_records(
                            recs, compress=compress
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["shard_id", "bytes"])

    parts = min(max(1, n_shards), 64)
    return spark.range(0, n_shards, numPartitions=parts).mapInPandas(
        gen, SHARDS_SCHEMA
    )
