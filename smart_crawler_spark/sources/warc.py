"""WARC shards as a Spark source: a crawl archive arrives as a table
of shard blobs (or a binaryFile scan of .warc.gz objects) and explodes
into one row per archived fetch.

Scale shape: shards are self-contained (per-record gzip members,
functions/warc.py), so record extraction is embarrassingly parallel —
one mapInPandas over the shard rows, no shuffle, no cross-shard state.
A 100 TB archive reads at object-store throughput with per-shard
tasks; damaged shards surface as an error column instead of killing
the scan (the ingest decides whether to quarantine or abort).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from smart_crawler_spark.functions.warc import decode_warc

RECORDS_SCHEMA = (
    "shard_id string, rec_idx int, url string, warc_type string, "
    "status int, n_bytes long, payload_md5 string, err string"
)


def warc_records(
    shards: DataFrame,
    shard_col: str = "shard_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Explode WARC shard blobs into per-record metadata rows: URL,
    record type, status, payload length + md5. Payload bytes stay out
    of the output on purpose — the dedup/classify stages downstream
    key on the digest, and carrying 100 TB of bodies through a second
    table doubles the IO; a consumer that needs bodies re-reads its
    shard subset. A shard that fails to parse yields ONE row with
    ``err`` set and null record fields."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "shard_id", "rec_idx", "url", "warc_type", "status",
            "n_bytes", "payload_md5", "err",
        ]
        for pdf in batches:
            rows = []
            for sid, data in zip(pdf[shard_col], pdf[bytes_col]):
                try:
                    recs = decode_warc(bytes(data))
                except ValueError as e:
                    rows.append(
                        {
                            "shard_id": sid, "rec_idx": None,
                            "url": None, "warc_type": None,
                            "status": None, "n_bytes": None,
                            "payload_md5": None, "err": str(e),
                        }
                    )
                    continue
                for i, r in enumerate(recs):
                    rows.append(
                        {
                            "shard_id": sid,
                            "rec_idx": i,
                            "url": r["url"],
                            "warc_type": r["warc_type"],
                            "status": r["status"],
                            "n_bytes": len(r["payload"]),
                            "payload_md5": hashlib.md5(
                                r["payload"]
                            ).hexdigest(),
                            "err": None,
                        }
                    )
            out = pd.DataFrame(rows, columns=cols)
            for c in ("rec_idx", "status"):
                out[c] = pd.array(out[c], dtype="Int32")
            out["n_bytes"] = pd.array(out["n_bytes"], dtype="Int64")
            yield out

    return shards.select(
        shards[shard_col].alias(shard_col), shards[bytes_col]
    ).mapInPandas(gen, RECORDS_SCHEMA)
