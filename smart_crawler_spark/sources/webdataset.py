"""WebDataset-style tar shards: the storage format vision training
loaders actually stream (one tar per shard; each sample is a group of
members sharing a basename — `img42.png` + `img42.txt` caption).

Sink: the shard ASSIGNMENT comes from operators/images.py shard_pack
(deterministic two-phase prefix-sum layout, ordered by (md5-bucket,
id)), so shard contents — and therefore shard BYTES — are independent
of input partitioning: any run of the engine writes byte-identical
tars. Tar metadata is pinned (mtime 0, uid/gid 0, USTAR) for the same
reason. One applyInPandas group per shard builds its tar in memory;
shards are bounded by shard_bytes + max_asset, so a group never
exceeds executor memory by construction.

Reader: shards are self-contained, so extraction is embarrassingly
parallel — one mapInPandas over shard blobs, no shuffle (same shape as
sources/warc.py). A damaged shard surfaces as one err row.

Format is public knowledge (POSIX ustar + the webdataset/tarp sample
convention); no loader code consulted.
"""

from __future__ import annotations

import hashlib
import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARDS_SCHEMA = "shard_id long, bytes binary, n_samples int"
MEMBERS_SCHEMA = (
    "shard_id long, member string, n_bytes long, payload_md5 string, "
    "err string"
)


def _tar_bytes(members: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(
        fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
    ) as tf:
        for name, payload in members:
            ti = tarfile.TarInfo(name=name)
            ti.size = len(payload)
            ti.mtime = 0
            ti.uid = ti.gid = 0
            ti.uname = ti.gname = ""
            ti.mode = 0o644
            tf.addfile(ti, io.BytesIO(payload))
    return buf.getvalue()


def write_webdataset_shards(
    images: DataFrame,
    shard_bytes: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Pack an image+caption corpus into webdataset tar shards:
    (shard_id, bytes, n_samples). Sample payload size (image bytes)
    drives the byte budget; captions and the fixed 512-byte tar
    headers ride along (bounded: +1536 bytes/sample overhead)."""
    from smart_crawler_spark.operators.images import shard_pack

    layout = shard_pack(
        images, shard_bytes=shard_bytes, n_buckets=n_buckets
    ).select("image_id", "shard_id", "shard_offset")
    packed = images.select("image_id", "bytes", "fmt", "caption").join(
        layout, "image_id"
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("shard_offset")
        members: list[tuple[str, bytes]] = []
        for _, r in pdf.iterrows():
            stem = r["image_id"]
            members.append((f"{stem}.{r['fmt']}", bytes(r["bytes"])))
            members.append((f"{stem}.txt", r["caption"].encode()))
        return pd.DataFrame(
            [
                {
                    "shard_id": int(pdf["shard_id"].iloc[0]),
                    "bytes": _tar_bytes(members),
                    "n_samples": len(pdf),
                }
            ]
        )

    return packed.groupBy("shard_id").applyInPandas(build, SHARDS_SCHEMA)


def webdataset_records(shards: DataFrame) -> DataFrame:
    """Explode tar shards into per-member metadata rows (name, length,
    payload md5) — payload bytes stay shard-side, consumers re-read
    their subset (same contract as warc_records). Damaged shards
    surface as one err row."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["shard_id", "member", "n_bytes", "payload_md5", "err"]
        for pdf in batches:
            rows = []
            for sid, data in zip(pdf["shard_id"], pdf["bytes"]):
                try:
                    with tarfile.open(
                        fileobj=io.BytesIO(bytes(data)), mode="r"
                    ) as tf:
                        extracted = [
                            (m.name, tf.extractfile(m).read())
                            for m in tf.getmembers()
                        ]
                except (tarfile.TarError, OSError) as e:
                    rows.append(
                        {
                            "shard_id": sid, "member": None,
                            "n_bytes": None, "payload_md5": None,
                            "err": str(e),
                        }
                    )
                    continue
                for name, payload in extracted:
                    rows.append(
                        {
                            "shard_id": sid,
                            "member": name,
                            "n_bytes": len(payload),
                            "payload_md5": hashlib.md5(
                                payload
                            ).hexdigest(),
                            "err": None,
                        }
                    )
            out = pd.DataFrame(rows, columns=cols)
            out["n_bytes"] = pd.array(out["n_bytes"], dtype="Int64")
            yield out

    return shards.select("shard_id", "bytes").mapInPandas(
        gen, MEMBERS_SCHEMA
    )


def webdataset_roundtrip_check(
    images: DataFrame, shard_bytes: int, n_buckets: int = 64
) -> DataFrame:
    """Write → read → verify: every corpus sample must come back from
    the tar shards with byte-identical image payload and caption.
    Output per image: (image_id, img_ok, caption_ok) — the SQL-stated
    invariant is TRUE/TRUE on every row."""
    shards = write_webdataset_shards(images, shard_bytes, n_buckets)
    members = webdataset_records(shards).filter(F.col("err").isNull())
    stem = F.regexp_replace("member", r"\.[a-z]+$", "")
    is_txt = F.col("member").endswith(".txt")
    got = members.groupBy(stem.alias("image_id")).agg(
        F.max(F.when(~is_txt, F.col("payload_md5"))).alias("img_md5"),
        F.max(F.when(is_txt, F.col("payload_md5"))).alias("cap_md5"),
    )
    want = images.select(
        "image_id",
        F.md5("bytes").alias("want_img"),
        F.md5(F.encode("caption", "UTF-8")).alias("want_cap"),
    )
    return want.join(got, "image_id", "left").select(
        "image_id",
        F.coalesce(F.col("img_md5") == F.col("want_img"), F.lit(False))
        .alias("img_ok"),
        F.coalesce(F.col("cap_md5") == F.col("want_cap"), F.lit(False))
        .alias("caption_ok"),
    )
