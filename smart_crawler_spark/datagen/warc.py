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


def generate_warc_shards(
    spark: SparkSession,
    n_shards: int,
    recs_per_shard: int,
    compress: bool = True,
) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for s in pdf["id"]:
                s = int(s)
                recs = [
                    warc_record_rule(s * recs_per_shard + j)
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
