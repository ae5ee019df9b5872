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
    "status int, n_bytes long, payload_md5 string, digest string, "
    "refers_to string, err string"
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
            "n_bytes", "payload_md5", "digest", "refers_to", "err",
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
                            "payload_md5": None, "digest": None,
                            "refers_to": None, "err": str(e),
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
                            "digest": r.get("digest"),
                            "refers_to": r.get("refers_to"),
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


def resolve_revisits(records: DataFrame) -> DataFrame:
    """Resolve WARC ``revisit`` records (WARC 1.1 §6.7 — the
    CommonCrawl storage-dedup layout: a re-fetch that found unchanged
    content stores NO payload, only the original capture's payload
    digest) back to the payload they deduplicated away.

    One equi-join on the digest: the response side aggregates to a
    (digest → canonical original) table first — min (shard_id,
    rec_idx) wins, so resolution is deterministic even when the same
    content was captured at several URLs — and revisits probe it by
    their declared ``WARC-Payload-Digest``. No broadcast assumption
    (both sides are archive-scale); AQE picks the strategy. Payload
    bytes never move — the output carries the original's locator +
    md5, and a consumer that needs bodies re-reads exactly those
    shards (same contract as ``warc_records``).

    Output: every input record row with
    - resolved_md5    : its own payload md5 (responses) or the
                        original's (revisits)
    - resolved_bytes  : payload length after resolution
    - orig_shard_id / orig_rec_idx : the original capture's locator
                        (null for responses and unresolved revisits)
    - resolved        : false only for a revisit whose digest matches
                        no response (a dangling revisit — surfaced,
                        not dropped, so the ingest can quarantine it).
    Error rows (err != null) pass through with resolved null."""
    import pyspark.sql.functions as F

    originals = (
        records.filter(
            (F.col("err").isNull()) & (F.col("warc_type") == "response")
        )
        .groupBy(
            F.concat(F.lit("md5:"), F.col("payload_md5")).alias("digest")
        )
        .agg(
            F.min(
                F.struct(
                    F.col("shard_id").alias("orig_shard_id"),
                    F.col("rec_idx").alias("orig_rec_idx"),
                    F.col("payload_md5").alias("orig_md5"),
                    F.col("n_bytes").alias("orig_bytes"),
                )
            ).alias("o")
        )
        .select("digest", "o.*")
    )
    # only the (rare) revisit rows go through the digest join; the
    # response/error bulk keeps its own columns map-side and unions back
    is_revisit = (F.col("err").isNull()) & (F.col("warc_type") == "revisit")
    keep = ["shard_id", "rec_idx", "url", "warc_type", "status", "err"]
    resolved_rev = (
        records.filter(is_revisit)
        .join(originals, ["digest"], "left")
        .select(
            *keep,
            F.col("orig_md5").alias("resolved_md5"),
            F.col("orig_bytes").alias("resolved_bytes"),
            "orig_shard_id",
            "orig_rec_idx",
            F.col("orig_md5").isNotNull().alias("resolved"),
        )
    )
    rest = records.filter(~is_revisit | F.col("err").isNotNull()).select(
        *keep,
        F.col("payload_md5").alias("resolved_md5"),
        F.col("n_bytes").alias("resolved_bytes"),
        F.lit(None).cast("string").alias("orig_shard_id"),
        F.lit(None).cast("int").alias("orig_rec_idx"),
        F.when(F.col("err").isNull(), F.lit(True)).alias("resolved"),
    )
    return rest.unionByName(resolved_rev)


def write_warc_shards(
    df: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_shards: int = 64,
) -> DataFrame:
    """The WARC SINK: rows hash into ``n_shards`` buckets on the shared
    md5 draw of their id and each bucket encodes its rows in id order
    into one per-record-gzip WARC blob — so shard BYTES are
    deterministic and layout-independent (same rows -> same shards ->
    same bytes on any run, engine, or partitioning; pinned by the
    roundtrip test). One groupBy shuffle; each shard encodes
    independently in applyInPandas. Write the result as a parquet blob
    table or dump each row to ``<shard_id>.warc.gz`` — the reader
    (warc_records) accepts both."""
    import pandas as pd

    from smart_crawler_spark.functions.warc import encode_warc_records
    from smart_crawler_spark.operators.textops import md5_hash32

    bucket = md5_hash32(id_col) % n_shards

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        recs = [
            {"url": u, "status": 200, "payload": bytes(p)}
            for u, p in zip(pdf[url_col], pdf[payload_col])
        ]
        sid = f"s{int(pdf['_shard'].iloc[0])}"
        return pd.DataFrame(
            [{"shard_id": sid, "bytes": encode_warc_records(recs)}]
        )

    return (
        df.withColumn("_shard", bucket)
        .groupBy("_shard")
        .applyInPandas(enc, "shard_id string, bytes binary")
    )


CDX_SCHEMA = (
    "shard_id string, rec_idx int, url string, warc_type string, "
    "status int, digest string, offset long, length long, "
    "slice_ok boolean, err string"
)


def cdx_index(
    shards: DataFrame,
    shard_col: str = "shard_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """CDX-style capture index over WARC shards: one row per record
    carrying the COMPRESSED MEMBER coordinates (offset, length) that
    random-access replay range-reads — the artifact every web archive
    (CommonCrawl cdx-*, OpenWayback) builds next to its WARCs. Sort the
    output by ``surt_key(url)`` (frontier/canonical.py) and you have
    the standard index layout: any domain's captures are one ordered
    prefix scan.

    ``slice_ok`` is the random-access PROOF, not an assumption: each
    member is re-decoded INDEPENDENTLY from its (offset, length) slice
    and must reproduce the full-stream parse byte-for-byte (headers and
    payload). Requires per-record gzip members (the CommonCrawl
    layout); a plain/damaged shard or a member/record count mismatch
    yields one ``err`` row, never a crash. Map-only — shards index
    independently, nothing shuffles."""
    from smart_crawler_spark.functions.warc import (
        decode_warc,
        gzip_member_spans,
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "shard_id", "rec_idx", "url", "warc_type", "status",
            "digest", "offset", "length", "slice_ok", "err",
        ]
        for pdf in batches:
            rows = []
            for sid, data in zip(pdf[shard_col], pdf[bytes_col]):
                data = bytes(data)
                try:
                    full = decode_warc(data)
                    spans = gzip_member_spans(data)
                    if len(spans) != len(full):
                        raise ValueError(
                            f"{len(spans)} members != {len(full)} records"
                        )
                except ValueError as e:
                    rows.append(
                        {
                            "shard_id": sid, "rec_idx": None,
                            "url": None, "warc_type": None,
                            "status": None, "digest": None,
                            "offset": None, "length": None,
                            "slice_ok": None, "err": str(e),
                        }
                    )
                    continue
                for i, ((off, ln), rec) in enumerate(zip(spans, full)):
                    sliced = decode_warc(data[off : off + ln])
                    rows.append(
                        {
                            "shard_id": sid,
                            "rec_idx": i,
                            "url": rec["url"],
                            "warc_type": rec["warc_type"],
                            "status": rec["status"],
                            "digest": rec.get("digest"),
                            "offset": off,
                            "length": ln,
                            "slice_ok": sliced == [rec],
                            "err": None,
                        }
                    )
            out = pd.DataFrame(rows, columns=cols)
            for c in ("rec_idx", "status"):
                out[c] = pd.array(out[c], dtype="Int32")
            for c in ("offset", "length"):
                out[c] = pd.array(out[c], dtype="Int64")
            yield out

    return shards.select(
        shards[shard_col].alias(shard_col), shards[bytes_col]
    ).mapInPandas(gen, CDX_SCHEMA)
