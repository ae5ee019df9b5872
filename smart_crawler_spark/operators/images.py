"""Multimodal (image) operators over binary payload columns.

The corpus is the input_hint table: (image_id, bytes, w, h, fmt,
caption, phash). Decoded pixels NEVER become a Spark type — they live as
numpy arrays inside Arrow-batched ``mapInPandas`` UDFs; only derived
features/bytes come back out. PNG decodes through the pure-numpy codec
in functions/png.py (lossless → exact invariant); JPEG through the
baseline codec in functions/jpeg.py (lossy → PSNR>=40dB invariant;
quality 98 keeps the 8x8 average-phash bit-identical on this corpus).
Unknown formats raise NotImplementedError under
``on_unsupported='error'`` or are passed through/skipped under
'null'/'skip'.

Operators: decode+verify (the per-row allclose/PSNR>=40dB invariant),
resize (nearest-neighbor, re-encoded PNG), channel/luma features, and
phash-based near-duplicate detection (block LSH on hamming distance).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smart_crawler_spark.functions.png import (
    decode_png,
    encode_png,
    perceptual_hash,
    psnr,
)

_DECODE_SCHEMA = (
    "image_id string, ok boolean, dec_w int, dec_h int, dec_phash long, "
    "mean_r double, mean_g double, mean_b double, err string"
)


def _decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        from smart_crawler_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(data)
    raise NotImplementedError(f"no decoder for fmt={fmt!r} in this sandbox")


def decode_features(images: DataFrame, on_unsupported: str = "null") -> DataFrame:
    """Decode each payload and emit verification features: decoded
    dims, recomputed phash, per-channel means. ``on_unsupported``:
    'null' → ok=false row; 'skip' → drop row; 'error' → raise."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                try:
                    px = _decode(bytes(data), fmt)
                    m = px.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        {
                            "image_id": img_id,
                            "ok": True,
                            "dec_w": px.shape[1],
                            "dec_h": px.shape[0],
                            "dec_phash": perceptual_hash(px),
                            "mean_r": float(m[0]),
                            "mean_g": float(m[1]),
                            "mean_b": float(m[2]),
                            "err": None,
                        }
                    )
                except NotImplementedError as e:
                    if on_unsupported == "error":
                        raise
                    if on_unsupported == "skip":
                        continue
                    rows.append(
                        {
                            "image_id": img_id, "ok": False, "dec_w": None,
                            "dec_h": None, "dec_phash": None, "mean_r": None,
                            "mean_g": None, "mean_b": None, "err": str(e),
                        }
                    )
            cols = [
                "image_id", "ok", "dec_w", "dec_h", "dec_phash",
                "mean_r", "mean_g", "mean_b", "err",
            ]
            data = {c: [r[c] for r in rows] for c in cols}
            # nullable ints: a None row must not coerce int64 -> float64
            # at construction (float64 silently corrupts 64-bit phashes)
            for c in ("dec_w", "dec_h", "dec_phash"):
                data[c] = pd.array(data[c], dtype="Int64")
            yield pd.DataFrame(data, columns=cols)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        gen, _DECODE_SCHEMA
    )


def verify_decode_invariant(images: DataFrame) -> DataFrame:
    """Per-row invariant check vs the stored metadata: decoded dims ==
    (w, h), recomputed phash == stored phash. For lossless formats this
    is the exact 'allclose' check; for lossy formats the PSNR>=40dB
    check runs in verify_against_reference."""
    feats = decode_features(images, on_unsupported="null")
    return (
        images.select("image_id", "w", "h", "phash", "fmt")
        .join(feats, "image_id")
        .select(
            "image_id",
            "fmt",
            "ok",
            (
                F.col("ok")
                & (F.col("dec_w") == F.col("w"))
                & (F.col("dec_h") == F.col("h"))
                & (F.col("dec_phash") == F.col("phash"))
            ).alias("invariant_ok"),
        )
    )


def verify_against_reference(
    images: DataFrame, min_psnr: float = 40.0
) -> DataFrame:
    """Decoded-pixel allclose/PSNR vs the deterministic reference pixels
    (the generator is the 'reference implementation' in this sandbox:
    pixels are a pure function of the image index)."""
    from smart_crawler_spark.datagen.images import image_pixels

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                idx = int(str(img_id).removeprefix("img"))
                ref = image_pixels(idx, int(w), int(h))
                try:
                    px = _decode(bytes(data), fmt)
                    val = psnr(ref, px)
                    ok = bool(np.array_equal(ref, px)) or val >= min_psnr
                    rows.append(
                        {"image_id": img_id, "psnr_ok": ok,
                         "allclose": bool(np.array_equal(ref, px))}
                    )
                except NotImplementedError:
                    rows.append(
                        {"image_id": img_id, "psnr_ok": None, "allclose": None}
                    )
            yield pd.DataFrame(rows, columns=["image_id", "psnr_ok", "allclose"])

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        gen, "image_id string, psnr_ok boolean, allclose boolean"
    )


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize; returns new PNG bytes + dims. Skips
    rows whose format has no decoder."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = _decode(bytes(data), fmt)
                except NotImplementedError:
                    continue
                h, w = px.shape[:2]
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                out = px[yi][:, xi]
                rows.append(
                    {
                        "image_id": img_id,
                        "bytes": encode_png(out),
                        "w": out_w,
                        "h": out_h,
                        "fmt": "png",
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        gen, "image_id string, bytes binary, w int, h int, fmt string"
    )


def image_pyramid(
    images: DataFrame, factors: tuple[int, ...] = (1, 2, 4)
) -> DataFrame:
    """Multi-resolution pyramid — the storage layout multi-res vision
    training reads (each sample served at several scales without
    re-decoding the original): one output row per (image, factor) with
    an exact f x f box-average (area) downscale, re-encoded PNG.

    Map-only fanout: decode once per image inside the Arrow batch, emit
    all levels from the same pixel array — no shuffle, no joins, output
    size bounded by sum(1/f^2) ~ 1.3x the input. Undecodable formats
    are skipped (same contract as resize_images).

    Box averaging preserves global mean luminance to within the 0.5
    per-block rounding bound (levels crop to a multiple of f first, so
    blocks are equal-sized and the global mean is the mean of block
    means) — emitted as ``mean_ok`` so the invariant is checkable in
    SQL without decoding."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["image_id", "level", "bytes", "w", "h", "mean_ok"]
        for pdf in batches:
            rows = []
            for img_id, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                try:
                    px = _decode(bytes(data), fmt)
                except NotImplementedError:
                    continue
                h, w = px.shape[:2]
                base_mean = float(px.mean())
                for f in factors:
                    ch, cw = h - h % f, w - w % f
                    if ch == 0 or cw == 0:
                        continue
                    block = (
                        px[:ch, :cw]
                        .reshape(ch // f, f, cw // f, f, 3)
                        .astype(np.float64)
                        .mean(axis=(1, 3))
                    )
                    out = np.round(block).astype(np.uint8)
                    rows.append(
                        {
                            "image_id": img_id,
                            "level": f,
                            "bytes": encode_png(out),
                            "w": cw // f,
                            "h": ch // f,
                            "mean_ok": bool(
                                abs(float(out.mean()) - base_mean)
                                <= 0.5 + 1e-6
                            )
                            if (ch == h and cw == w)
                            else None,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        gen,
        "image_id string, level int, bytes binary, w int, h int, "
        "mean_ok boolean",
    )


def _hamming_blocks(col: str, max_hamming: int) -> list:
    """Block decomposition for exact-recall hamming LSH: with B >
    max_hamming blocks, any pair within the distance differs in at most
    max_hamming blocks, so at least one block is identical (pigeonhole).
    64 bits are split into B near-equal spans; wider max_hamming ⇒ more,
    narrower blocks ⇒ bigger buckets — the standard recall/cost dial of
    multi-index hamming search.

    The guarantee needs max_hamming+1 blocks of >=1 bit, so over a
    64-bit hash it only holds for max_hamming <= 15 with 4-bit blocks
    (and degrades to ever-smaller buckets before that); reject larger
    radii instead of silently returning an approximate filter."""
    if max_hamming >= 16:
        raise ValueError(
            f"max_hamming={max_hamming}: pigeonhole recall over a 64-bit "
            "hash requires max_hamming <= 15 (needs max_hamming+1 "
            "non-empty blocks); use a multi-probe or exact scan instead"
        )
    n_blocks = max(max_hamming + 1, 2)
    base, extra = divmod(64, n_blocks)
    out, off = [], 0
    for b in range(n_blocks):
        width = base + (1 if b < extra else 0)
        out.append(
            F.struct(
                F.lit(b).alias("block"),
                F.shiftright(col, off)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
        )
        off += width
    return out


def phash_near_dup_pairs(images: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate images by phash hamming distance: block-LSH
    candidates with **guaranteed recall** (max_hamming+1 blocks ⇒ every
    pair within the distance shares >=1 identical block, pigeonhole),
    exact popcount verification on candidates."""
    blocks = images.select(
        F.col("image_id"),
        F.col("phash"),
        F.explode(F.array(*_hamming_blocks("phash", max_hamming))).alias("bk"),
    ).select("image_id", "phash", "bk.block", "bk.key")
    left = blocks.select(
        F.col("image_id").alias("id_a"), F.col("phash").alias("ph_a"),
        "block", "key",
    )
    right = blocks.select(
        F.col("image_id").alias("id_b"), F.col("phash").alias("ph_b"),
        "block", "key",
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (
        left.join(right, ["block", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def sample_frames(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling over binary payloads: decode in Arrow-batched
    mapInPandas, keep every ``every_n``-th frame, re-encode each kept
    frame as PNG. Real decode for fmt='y4m' (uncompressed YUV4MPEG2,
    functions/y4m.py — roundtrips at ~48 dB) and fmt='mjpeg' (AVI/MJPEG,
    functions/mjpeg.py — real per-frame baseline JPEG, ~43 dB at q98);
    inter-frame codecs (h264 etc.) raise NotImplementedError (no codec
    libs in this sandbox) — the schema, batching and partitioning are
    identical for any codec plugged in.

    Input: (video_id string, bytes binary, fmt string).
    Output: (video_id string, frame_no int, bytes binary, w int, h int).
    """
    from smart_crawler_spark.functions.mjpeg import decode_mjpeg
    from smart_crawler_spark.functions.y4m import decode_y4m

    decoders = {"y4m": decode_y4m, "mjpeg": decode_mjpeg, "avi": decode_mjpeg}

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, data, fmt in zip(pdf["video_id"], pdf["bytes"], pdf["fmt"]):
                if fmt not in decoders:
                    raise NotImplementedError(
                        f"no video decoder for fmt={fmt!r} in this sandbox"
                    )
                frames, meta = decoders[fmt](bytes(data))
                for fno in range(0, meta["n_frames"], every_n):
                    rows.append(
                        {
                            "video_id": vid,
                            "frame_no": fno,
                            "bytes": encode_png(frames[fno]),
                            "w": meta["w"],
                            "h": meta["h"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_no", "bytes", "w", "h"]
            )

    return videos.select("video_id", "bytes", "fmt").mapInPandas(
        gen, "video_id string, frame_no int, bytes binary, w int, h int"
    )


def metadata_audit(images: DataFrame) -> DataFrame:
    """Embedded-metadata audit — the EXIF/PII sweep of an image corpus:
    parse every tEXt chunk out of PNG payloads (functions/png.py
    text_chunks; JPEG rows carry none in this codec family) and emit
    one (image_id, key, value) row per metadata entry. Map-only header
    walk: chunk parsing touches lengths and tags, never inflates IDAT,
    so auditing a 100 TB corpus is bounded by payload IO.

    Output: (image_id string, key string, value string)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from smart_crawler_spark.functions.png import text_chunks

        for pdf in batches:
            rows = []
            for iid, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                if fmt != "png":
                    continue
                for k, v in text_chunks(bytes(data)):
                    rows.append({"image_id": iid, "key": k, "value": v})
            yield pd.DataFrame(rows, columns=["image_id", "key", "value"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        gen, "image_id string, key string, value string"
    )


def strip_metadata_verify(images: DataFrame) -> DataFrame:
    """Metadata STRIP with a pixel-preservation proof: re-emit each PNG
    keeping only critical chunks (functions/png.py strip_ancillary),
    then decode BOTH payloads and compare pixels byte-for-byte. The
    publish-safe export pass: provably drops every tEXt entry, provably
    changes no pixel. JPEG rows pass through (n_before = n_after = 0).
    Map-only, one image in flight per row.

    Output: (image_id, fmt, n_before int, n_after int, pixels_ok)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from smart_crawler_spark.functions.png import (
            decode_png,
            strip_ancillary,
            text_chunks,
        )

        for pdf in batches:
            rows = []
            for iid, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                data = bytes(data)
                if fmt != "png":
                    rows.append(
                        {
                            "image_id": iid,
                            "fmt": fmt,
                            "n_before": 0,
                            "n_after": 0,
                            "pixels_ok": True,
                        }
                    )
                    continue
                stripped = strip_ancillary(data)
                rows.append(
                    {
                        "image_id": iid,
                        "fmt": fmt,
                        "n_before": len(text_chunks(data)),
                        "n_after": len(text_chunks(stripped)),
                        "pixels_ok": bool(
                            np.array_equal(
                                decode_png(data), decode_png(stripped)
                            )
                        ),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "fmt", "n_before", "n_after", "pixels_ok",
                ],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        gen,
        "image_id string, fmt string, n_before int, n_after int, "
        "pixels_ok boolean",
    )


def scene_cuts(videos: DataFrame, threshold: float = 16.0) -> DataFrame:
    """Video scene-cut detection: decode each clip in Arrow-batched
    mapInPandas, compute the mean-absolute-difference (MAD) between
    every adjacent frame pair, and emit a row per cut (MAD >
    ``threshold``) — the shot-boundary primitive behind frame-level
    video dedup and per-scene sampling in a multimodal training
    pipeline. In-scene drift (brightness/noise, MAD of a few levels,
    including MJPEG q98 decode noise) stays far below the threshold;
    a hard cut between independent frames lands near the uniform-diff
    expectation (~85 levels), so the margin is wide on both sides.

    Each task touches only its own clips (map-only; the per-row state
    is one previous frame, never the whole clip history), so a 10^8-
    clip corpus scans embarrassingly parallel with no shuffle at all.

    Input: (video_id string, bytes binary, fmt string).
    Output: (video_id string, cut_frame int, scene_no int) — cut_frame
    is the first frame of the NEW scene, scene_no its 1-based index.
    """
    from smart_crawler_spark.functions.mjpeg import decode_mjpeg
    from smart_crawler_spark.functions.y4m import decode_y4m

    decoders = {"y4m": decode_y4m, "mjpeg": decode_mjpeg, "avi": decode_mjpeg}

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, data, fmt in zip(
                pdf["video_id"], pdf["bytes"], pdf["fmt"]
            ):
                if fmt not in decoders:
                    raise NotImplementedError(
                        f"no video decoder for fmt={fmt!r} in this sandbox"
                    )
                frames, meta = decoders[fmt](bytes(data))
                scene = 0
                prev = None
                for fno in range(meta["n_frames"]):
                    cur = frames[fno].astype(np.int16)
                    if prev is not None:
                        mad = float(np.mean(np.abs(cur - prev)))
                        if mad > threshold:
                            scene += 1
                            rows.append(
                                {
                                    "video_id": vid,
                                    "cut_frame": fno,
                                    "scene_no": scene,
                                }
                            )
                    prev = cur
            yield pd.DataFrame(
                rows, columns=["video_id", "cut_frame", "scene_no"]
            )

    return videos.select("video_id", "bytes", "fmt").mapInPandas(
        gen, "video_id string, cut_frame int, scene_no int"
    )


# SDXL-style aspect-bucket ladder: (bw, bh) ratio archetypes from
# portrait 1:2 through landscape 2:1. Training batches must be
# shape-homogeneous; bucketing by nearest log-aspect is the standard
# way to batch a mixed-shape image corpus without destructive cropping.
DEFAULT_ASPECT_BUCKETS = (
    (1, 2), (9, 16), (3, 4), (1, 1), (4, 3), (16, 9), (2, 1),
)


def sniff_dims_df(
    images: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """(image_id, fmt, w, h) read from container HEADERS only
    (functions/headers.py) — never decodes pixels, so a dims scan of a
    100 TB corpus is bounded by parquet column IO. Rows whose payload is
    neither PNG nor JPEG come back with null dims. ``passthrough``
    columns ride through the Arrow batch unchanged (columnar copy, no
    re-join shuffle — joining dims back on image_id would be a full
    corpus shuffle at scale)."""
    from smart_crawler_spark.functions.headers import sniff_dims

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [sniff_dims(bytes(d)) for d in pdf["bytes"]]
            out = pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "fmt": [m[0] if m else None for m in metas],
                    "w": pd.array(
                        [m[1] if m else None for m in metas], dtype="Int64"
                    ),
                    "h": pd.array(
                        [m[2] if m else None for m in metas], dtype="Int64"
                    ),
                }
            )
            for c in passthrough:
                out[c] = pdf[c].values
            yield out

    extra = "".join(
        f", {c} {images.schema[c].dataType.simpleString()}"
        for c in passthrough
    )
    return images.select("image_id", "bytes", *passthrough).mapInPandas(
        gen, f"image_id string, fmt string, w int, h int{extra}"
    )


def caption_gate(
    images: DataFrame,
    min_w: int = 48,
    min_h: int = 40,
    min_words: int = 4,
    max_chars: int = 200,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """LAION/DataComp-style image+text curation gate — the standard
    first pass over a crawled image-caption corpus: minimum resolution
    (from container HEADERS only, never decoding pixels) and a usable
    caption (enough words to describe anything, not an overflowing
    alt-text dump). One mapInPandas header sniff with the caption
    riding through the Arrow batch + a pure Catalyst predicate: no
    join, no shuffle, parquet-IO bound at 100 TB. ``passthrough``
    columns survive into the output (Arrow columnar copy, same as
    sniff_dims_df)."""
    dims = sniff_dims_df(
        images, passthrough=("caption",) + tuple(passthrough)
    )
    n_words = F.size(
        F.filter(F.split(F.col("caption"), r"\s+"), lambda x: x != "")
    ).cast("int")
    # coalesce: unparseable payloads (null dims) and null captions are
    # DROPS (keep=false), never null flags
    keep = F.coalesce(
        (F.col("w") >= min_w)
        & (F.col("h") >= min_h)
        & (n_words >= min_words)
        & (F.length("caption") <= max_chars),
        F.lit(False),
    )
    return dims.select(
        "image_id",
        "fmt",
        "w",
        "h",
        n_words.alias("n_words"),
        keep.alias("keep"),
        *passthrough,
    )


def decode_bomb_guard(
    images: DataFrame,
    max_megapixels: float = 16.0,
    max_px_per_byte: float = 50.0,
) -> DataFrame:
    """Decode-cost guard for a crawled image corpus — flag payloads
    whose DECODED size is an attack before any pixel is decoded:
    ``oversize`` (header-declared w×h above ``max_megapixels``) and
    ``ratio_bomb`` (more than ``max_px_per_byte`` decoded pixels per
    payload byte — the decompression-bomb signature: a multi-megapixel
    solid-color PNG deflates to a few KB, while organic photos carry
    well under ~3 px/byte even at high compression). Dims come from
    container headers only (sniff_dims_df), the payload length rides
    through the Arrow batch, the verdict is a Catalyst predicate: no
    decode, no join, no shuffle. Unparseable headers fail CLOSED
    (keep=false) — a guard that cannot size a payload must not admit
    it to the decode tier.

    Why it matters at 100 TB: one 64k×64k PNG (12 GB decoded) inside a
    mapInPandas decode batch OOMs the executor and, with task retries,
    can poison every executor in turn — the guard costs a header sniff.
    """
    sized = images.withColumn("n_bytes", F.length("bytes"))
    dims = sniff_dims_df(sized, passthrough=("n_bytes",))
    px = F.col("w").cast("double") * F.col("h").cast("double")
    oversize = F.coalesce(px > max_megapixels * 1e6, F.lit(True))
    ratio_bomb = F.coalesce(
        px > max_px_per_byte * F.col("n_bytes"), F.lit(True)
    )
    return dims.select(
        "image_id",
        "w",
        "h",
        "n_bytes",
        oversize.alias("oversize"),
        ratio_bomb.alias("ratio_bomb"),
        (~oversize & ~ratio_bomb).alias("keep"),
    )


def aspect_bucket_expr(
    w, h, buckets: tuple[tuple[int, int], ...] = DEFAULT_ASPECT_BUCKETS
):
    """Nearest-log-aspect bucket as a pure Catalyst CASE chain (map-only,
    zero shuffle, whole-stage codegen): buckets sorted by ratio, an
    image belongs to the bucket whose log-ratio interval (split at
    midpoints) contains ln(w/h). The midpoints are driver-side Python
    floats baked into the plan, so the DuckDB oracle replays the exact
    same thresholds. Assignment = nearest ln-ratio (midpoint split is
    equivalent), ties go to the wider bucket (right-closed intervals)."""
    import math

    ordered = sorted(buckets, key=lambda b: b[0] / b[1])
    logs = [math.log(bw / bh) for bw, bh in ordered]
    mids = [(a + b) / 2 for a, b in zip(logs, logs[1:])]
    lr = F.log(w.cast("double") / h.cast("double"))
    expr = F.lit(f"{ordered[-1][0]}x{ordered[-1][1]}")
    for (bw, bh), mid in zip(reversed(ordered[:-1]), reversed(mids)):
        expr = F.when(lr < F.lit(mid), F.lit(f"{bw}x{bh}")).otherwise(expr)
    return expr


def aspect_buckets(
    images: DataFrame,
    buckets: tuple[tuple[int, int], ...] = DEFAULT_ASPECT_BUCKETS,
) -> DataFrame:
    """Assign every image to its nearest aspect-ratio bucket using
    header-sniffed dims (no pixel decode). Map-only end to end."""
    dims = sniff_dims_df(images)
    return dims.select(
        "image_id",
        "fmt",
        "w",
        "h",
        aspect_bucket_expr(F.col("w"), F.col("h"), buckets).alias("bucket"),
    )


def jpeg_quality_estimates(images: DataFrame) -> DataFrame:
    """Encode-quality forensics from the JPEG header alone: parse the
    luma quantization table out of the DQT segment (functions/headers.py
    sniff_jpeg_dqt — O(header) bytes, never decodes pixels) and match it
    against the libjpeg/IJG scaling law (Annex-K base table scaled by
    quality) — ``q_est`` is the quality whose scaled table is nearest in
    L1 (lowest q on ties), ``exact`` marks a byte-exact table match.
    Corpora re-compressed at low quality are damaged goods for training;
    this flags them at parquet-scan cost. Non-JPEG rows pass through
    with null estimates. Map-only Arrow-batched mapInPandas; the 100
    candidate tables are precomputed once per task."""
    from smart_crawler_spark.functions.headers import sniff_jpeg_dqt
    from smart_crawler_spark.functions.jpeg import _QY, _ZZ, _scaled_q

    candidates = np.stack(
        [_scaled_q(_QY, q).ravel()[_ZZ] for q in range(1, 101)]
    )  # (100, 64) in zigzag order, the DQT file order

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data in zip(pdf["image_id"], pdf["bytes"]):
                tabs = sniff_jpeg_dqt(bytes(data))
                if not tabs or 0 not in tabs:
                    rows.append(
                        {"image_id": img_id, "fmt": None if tabs is None
                         else "jpeg", "q_est": None, "exact": None}
                    )
                    continue
                t = np.asarray(tabs[0], dtype=np.int64)
                dist = np.abs(candidates - t).sum(axis=1)
                qi = int(np.argmin(dist))  # argmin takes the FIRST (lowest q)
                rows.append(
                    {
                        "image_id": img_id,
                        "fmt": "jpeg",
                        "q_est": qi + 1,
                        "exact": bool(dist[qi] == 0),
                    }
                )
            out = pd.DataFrame(
                rows, columns=["image_id", "fmt", "q_est", "exact"]
            )
            out["q_est"] = pd.array(out["q_est"], dtype="Int32")
            out["exact"] = pd.array(out["exact"], dtype="boolean")
            yield out

    return images.select("image_id", "bytes").mapInPandas(
        gen, "image_id string, fmt string, q_est int, exact boolean"
    )


def image_quality_stats(
    images: DataFrame,
    min_contrast: float = 8.0,
    min_entropy: float = 3.0,
) -> DataFrame:
    """Per-image quality-filter features for a training-data pipeline:
    mean luma, luma std (contrast), and 256-bin luma-histogram entropy,
    with the keep/drop decision (drop flat/low-information images —
    banners, solid placeholders, tracking pixels). Decode runs in
    Arrow-batched mapInPandas; thresholds are plan constants."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                try:
                    px = _decode(bytes(data), fmt)
                except NotImplementedError:
                    rows.append(
                        {"image_id": img_id, "fmt": fmt, "mean_luma": None,
                         "contrast": None, "entropy": None}
                    )
                    continue
                luma = (
                    0.299 * px[..., 0]
                    + 0.587 * px[..., 1]
                    + 0.114 * px[..., 2]
                )
                hist = np.bincount(
                    luma.astype(np.uint8).ravel(), minlength=256
                )
                p = hist[hist > 0] / luma.size
                rows.append(
                    {
                        "image_id": img_id,
                        "fmt": fmt,
                        "mean_luma": float(luma.mean()),
                        "contrast": float(luma.std()),
                        "entropy": float(-(p * np.log2(p)).sum()),
                    }
                )
            out = pd.DataFrame(
                rows,
                columns=["image_id", "fmt", "mean_luma", "contrast", "entropy"],
            )
            yield out

    stats = images.select("image_id", "bytes", "fmt").mapInPandas(
        gen,
        "image_id string, fmt string, mean_luma double, contrast double, "
        "entropy double",
    )
    keep = (
        F.col("contrast").isNotNull()
        & (F.col("contrast") >= min_contrast)
        & (F.col("entropy") >= min_entropy)
    )
    return stats.select("*", keep.alias("keep"))


def exact_dup_groups(images: DataFrame) -> DataFrame:
    """Exact (byte-identical) image dedup: md5 over the raw payload —
    one hash aggregation (map-side partial) + an id-only equi-join back;
    pixel data never shuffles beyond the md5. Output per image:
    (image_id, group_rep, group_size) with the lexicographically
    smallest member as the canonical representative."""
    hashed = images.select("image_id", F.md5("bytes").alias("img_hash"))
    groups = hashed.groupBy("img_hash").agg(
        F.min("image_id").alias("group_rep"),
        F.count(F.lit(1)).cast("int").alias("group_size"),
    )
    return hashed.join(groups, "img_hash").select(
        "image_id", "group_rep", "group_size"
    )


def joint_dup_pairs(
    images: DataFrame,
    max_hamming: int = 6,
    decode: bool = True,
) -> DataFrame:
    """Candidate+verified joint duplicate PAIRS — the single-pass stage
    of ``joint_dup_groups`` (see there for semantics and the scale
    rationale). Returns (id_a, id_b, hamming) with id_a < id_b; the
    caption hash is part of the LSH bucket equi-join key (plan-pinned
    in tests/test_plans.py)."""
    cap_hash = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("caption")), r"\s+", " "))
    ).alias("cap_hash")
    if decode:
        feats = decode_features(images, on_unsupported="skip").filter(
            "ok"
        ).select("image_id", F.col("dec_phash").alias("ph"))
        keyed = images.select("image_id", cap_hash).join(feats, "image_id")
    else:
        keyed = images.select(
            "image_id", cap_hash, F.col("phash").alias("ph")
        )
    blocks = keyed.select(
        "image_id",
        "ph",
        "cap_hash",
        F.explode(F.array(*_hamming_blocks("ph", max_hamming))).alias("bk"),
    ).select("image_id", "ph", "cap_hash", "bk.block", "bk.key")
    left = blocks.select(
        F.col("image_id").alias("id_a"), F.col("ph").alias("ph_a"),
        "cap_hash", "block", "key",
    )
    right = blocks.select(
        F.col("image_id").alias("id_b"), F.col("ph").alias("ph_b"),
        "cap_hash", "block", "key",
    )
    return (
        left.join(right, ["cap_hash", "block", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).alias(
                "hamming"
            ),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def joint_dup_groups(
    images: DataFrame,
    max_hamming: int = 6,
    decode: bool = True,
) -> DataFrame:
    """Joint image+caption near-duplicate groups — the dedup rule a
    web-scale image+caption corpus actually needs: two rows are
    duplicates iff their DECODED pixels near-match (phash hamming <=
    ``max_hamming``; recomputed from bytes when ``decode``, else the
    stored phash column) AND their captions are exactly equal after
    text normalization. Alt-text boilerplate ("stock photo") on
    different images and re-encoded copies of one image with rewritten
    captions both survive; true page-mirror copies collapse.

    Scale shape: the caption's md5 is FOLDED INTO the LSH bucket key —
    candidates come from an equi-join on (hamming-block, block-key,
    caption-hash), so a viral image (hot phash) shared under thousands
    of captions never concentrates into one bucket, and caption
    equality costs no separate join. Pixels stay inside the Arrow
    decode UDF; everything after it ships (id, phash, caption-hash)
    only. Groups come from connected components (min-label, O(log d)
    rounds — operators/components.py).

    Output: (image_id, component) with component = min image_id of the
    duplicate group; singletons map to themselves."""
    from smart_crawler_spark.operators.components import connected_components

    if decode:
        ids = decode_features(images, on_unsupported="skip").filter(
            "ok"
        ).select(F.col("image_id").alias("id"))
    else:
        ids = images.select(F.col("image_id").alias("id"))
    return connected_components(
        joint_dup_pairs(images, max_hamming=max_hamming, decode=decode),
        nodes=ids,
        src="id_a",
        dst="id_b",
        node_col="id",
    ).select(F.col("id").alias("image_id"), F.col("comp").alias("component"))


def joint_block_index(
    images: DataFrame, max_hamming: int = 6, decode: bool = False
) -> DataFrame:
    """The storable LSH index behind joint image+caption dedup: one row
    per (image, hamming block) keyed on (cap_hash, block, key) — the
    same bucket construction as ``joint_dup_pairs``. A continuously-
    ingesting pipeline materializes this per corpus snapshot (bucketed
    by the join key, sources/bucketed.py) and probes it per batch.
    Output: (image_id, ph, cap_hash, block, key)."""
    cap_hash = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("caption")), r"\s+", " "))
    ).alias("cap_hash")
    if decode:
        feats = decode_features(images, on_unsupported="skip").filter(
            "ok"
        ).select("image_id", F.col("dec_phash").alias("ph"))
        keyed = images.select("image_id", cap_hash).join(feats, "image_id")
    else:
        keyed = images.select(
            "image_id", cap_hash, F.col("phash").alias("ph")
        )
    return keyed.select(
        "image_id",
        "ph",
        "cap_hash",
        F.explode(F.array(*_hamming_blocks("ph", max_hamming))).alias("bk"),
    ).select("image_id", "ph", "cap_hash", "bk.block", "bk.key")


def incremental_image_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    max_hamming: int = 4,
    corpus_index: DataFrame | None = None,
) -> DataFrame:
    """Dedup an incoming image+caption batch AGAINST an existing corpus
    — the image twin of minhash.incremental_near_dup, and the shape an
    ingesting vision pipeline actually runs: per-batch cost scales with
    the batch (probe of a stored index), never corpus x corpus. The
    duplicate rule is the joint one (caption equality via cap_hash in
    the bucket key + phash hamming <= max_hamming), so exact re-crawls
    AND re-encoded copies both collapse while boilerplate captions on
    different images survive.

    Candidates: batch blocks equi-join the corpus index on (cap_hash,
    block, key) — ids only through the shuffle; each side's phash
    re-joins once for the exact popcount verify. Best match is a
    groupBy min(struct(hamming, dup_of)) — map-side combinable.

    Output: EVERY batch row — (image_id, is_dup, dup_of)."""
    if corpus_index is None:
        corpus_index = joint_block_index(corpus, max_hamming)
    batch_index = joint_block_index(batch, max_hamming)
    cand = (
        batch_index.select(
            F.col("image_id").alias("_bid"), F.col("ph").alias("ph_b"),
            "block", "key", "cap_hash",
        )
        .join(
            corpus_index.select(
                F.col("image_id").alias("dup_of"),
                F.col("ph").alias("ph_c"),
                "block", "key", "cap_hash",
            ),
            ["cap_hash", "block", "key"],
        )
        .select(
            "_bid",
            "dup_of",
            F.bit_count(
                F.col("ph_b").bitwiseXOR(F.col("ph_c"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    best = cand.groupBy("_bid").agg(
        F.min(F.struct("hamming", "dup_of")).alias("m")
    )
    return (
        batch.select(F.col("image_id"))
        .join(best, F.col("image_id") == F.col("_bid"), "left")
        .select(
            "image_id",
            F.col("m").isNotNull().alias("is_dup"),
            F.col("m.dup_of").alias("dup_of"),
        )
    )


def caption_boilerplate(
    images: DataFrame, min_images: int = 3
) -> DataFrame:
    """Corpus-frequency caption filter (the LAION/DataComp boilerplate
    rule): a caption shared by >= ``min_images`` images is alt-text
    boilerplate ("stock photo", "thumb", theme defaults) — it carries
    no supervision signal and poisons contrastive training, so flag
    every image carrying one. Complements the per-row ``caption_gate``
    (length/size rules), which can't see corpus-wide repetition.

    Scale shape: one map-side-partial hash agg on the normalized
    caption's md5, the tiny >=threshold hot set broadcasts back (the
    watermark hot-set shape) — pixels and caption text never shuffle.

    Output: (image_id, boilerplate)."""
    cap_hash = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("caption")), r"\s+", " "))
    ).alias("cap_hash")
    keyed = images.select("image_id", cap_hash)
    hot = (
        keyed.groupBy("cap_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_images)
        .select("cap_hash", F.lit(True).alias("_hot"))
    )
    return keyed.join(F.broadcast(hot), "cap_hash", "left").select(
        "image_id", F.coalesce(F.col("_hot"), F.lit(False)).alias(
            "boilerplate"
        )
    )


def benchmark_image_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    max_hamming: int = 4,
) -> DataFrame:
    """Eval-set decontamination for an image+caption corpus: flag every
    corpus row whose content leaks a benchmark image — the image-side
    twin of the 13-gram text ``benchmark_contamination``
    (operators/textops.py). Two match paths:

    - ``exact``  — md5 over the raw payload bytes equi-joins the
      benchmark's md5 set: byte-identical leaks (same file re-crawled).
    - ``phash``  — re-encoded leaks (same pixels through a different
      codec/quality, so the bytes differ): phash hamming-block LSH with
      pigeonhole-guaranteed recall (``_hamming_blocks``) JOINTLY keyed
      on the normalized caption's md5, exactly as ``joint_dup_pairs``
      does — an 8x8 avg-hash alone collides across genuinely different
      images, and a leaked (image, caption) pair keeps its caption, so
      caption equality is part of the leak definition (the DataComp /
      LAION eval-dedup rule) and of the bucket key (a hot phash never
      concentrates into one bucket).

    Scale shape: the benchmark side is the bounded dimension table
    (eval sets are 1e4..1e6 rows vs 1e10 corpus rows) — both its md5
    set and its exploded block table broadcast; the corpus never
    shuffles pixel bytes, only (image_id, md5 / block-key) columns
    move, and both probes are map-side broadcast hash joins.

    Output: one row per contaminated corpus image —
    (image_id, bench_id, method) with method 'exact' preferred over
    'phash' and ties broken on the smallest bench_id."""
    cap_hash = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("caption")), r"\s+", " "))
    ).alias("cap_hash")
    c = corpus.select(
        "image_id", F.md5("bytes").alias("img_hash"), "phash", cap_hash
    )
    b = benchmark.select(
        F.col("image_id").alias("bench_id"),
        F.md5("bytes").alias("bench_hash"),
        F.col("phash").alias("bench_phash"),
        cap_hash,
    )
    exact = c.join(
        F.broadcast(b.select("bench_id", "bench_hash")),
        c.img_hash == F.col("bench_hash"),
    ).select("image_id", "bench_id", F.lit("exact").alias("method"))

    cb = c.select(
        "image_id",
        "phash",
        "cap_hash",
        F.explode(F.array(*_hamming_blocks("phash", max_hamming))).alias("bk"),
    ).select("image_id", "phash", "cap_hash", "bk.block", "bk.key")
    bb = b.select(
        "bench_id",
        "bench_phash",
        "cap_hash",
        F.explode(
            F.array(*_hamming_blocks("bench_phash", max_hamming))
        ).alias("bk"),
    ).select("bench_id", "bench_phash", "cap_hash", "bk.block", "bk.key")
    ham = F.bit_count(F.col("phash").bitwiseXOR(F.col("bench_phash")))
    perceptual = (
        cb.join(F.broadcast(bb), ["cap_hash", "block", "key"])
        .filter(ham <= max_hamming)
        .select("image_id", "bench_id")
        .distinct()
        .select("image_id", "bench_id", F.lit("phash").alias("method"))
    )
    best = (
        exact.unionByName(perceptual)
        .groupBy("image_id")
        .agg(
            F.min(
                F.struct(
                    F.when(F.col("method") == "exact", 0)
                    .otherwise(1)
                    .alias("rank"),
                    F.col("bench_id").alias("bench_id"),
                    F.col("method").alias("method"),
                )
            ).alias("m")
        )
    )
    return best.select(
        "image_id", F.col("m.bench_id").alias("bench_id"),
        F.col("m.method").alias("method"),
    )


def shard_pack(
    assets: DataFrame,
    shard_bytes: int,
    n_buckets: int = 64,
    id_col: str = "image_id",
    size_col: str | None = None,
) -> DataFrame:
    """Byte-budget shard layout for a multimodal corpus (the
    webdataset/tar-shard writing stage): lay the assets out as ONE
    deterministic byte stream — ordered by (md5-bucket, id), the same
    engine-reproducible layout as ``sequence_pack`` — and assign each
    asset to the shard containing its START offset. Atomic assets are
    never split, so a shard can overflow by at most one asset (the
    standard streaming-writer rule: exact first-fit with per-shard
    reset is a sequential recurrence — each boundary depends on the
    previous — and cannot be parallelized without changing the layout;
    start-offset assignment is a pure prefix sum and bounds shard size
    by ``shard_bytes + max_asset - 1``).

    The prefix sum is the two-phase shape shared with
    ``textops.sequence_pack``: per-md5-bucket window cumsum (parallel)
    + an ``n_buckets``-row broadcast offset table (the only serial
    step). ``size_col`` defaults to ``octet_length(bytes)``.

    Output: (id, n_bytes, shard_id, shard_offset, overflows) —
    ``overflows`` marks the at-most-one asset per shard whose tail
    crosses the budget."""
    from smart_crawler_spark.operators.textops import md5_hash32

    size = (
        F.col(size_col) if size_col else F.octet_length(F.col("bytes"))
    ).cast("long")
    bucket = md5_hash32(id_col) % n_buckets
    base = assets.select(
        F.col(id_col), bucket.alias("bucket"), size.alias("n_bytes")
    )
    from pyspark.sql import Window

    in_bucket = Window.partitionBy("bucket").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    within = base.withColumn(
        "_pre", F.coalesce(F.sum("n_bytes").over(in_bucket), F.lit(0))
    )
    across = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        base.groupBy("bucket")
        .agg(F.sum("n_bytes").alias("_bb"))
        .select(
            "bucket",
            F.coalesce(F.sum("_bb").over(across), F.lit(0)).alias("_boff"),
        )
    )
    start = F.col("_boff") + F.col("_pre")
    end = start + F.greatest(F.col("n_bytes"), F.lit(1)) - 1
    return within.join(F.broadcast(offsets), "bucket").select(
        F.col(id_col),
        F.col("n_bytes"),
        F.floor(start / shard_bytes).alias("shard_id"),
        (start % shard_bytes).alias("shard_offset"),
        (F.floor(end / shard_bytes) > F.floor(start / shard_bytes)).alias(
            "overflows"
        ),
    )


# ------------------------------------------------------------- patches

_PATCH_SCHEMA = (
    "image_id string, py int, px int, patch int, data binary, "
    "patch_hash string"
)


def extract_patches(
    images: DataFrame, patch: int = 8, with_bytes: bool = True
) -> DataFrame:
    """Tile each decoded image into non-overlapping ``patch``×``patch``
    tiles (ViT-style preprocessing; partial edge tiles are dropped, so
    the grid is floor(h/p) × floor(w/p)). One output row per tile:
    (image_id, py, px, patch, data, patch_hash) with ``data`` the raw
    row-major RGB bytes of the tile and ``patch_hash`` its md5.

    Scale shape: pixels decode ONCE per image inside the Arrow batch
    and leave it already cut into tiles — a 192-byte payload per row at
    patch=8, or NO payload at all under ``with_bytes=False`` (the
    mining path: downstream dedup/watermark aggregations need only the
    hash, so the shuffle ships (id, py, px, 32-hex) per tile). Map-only;
    no shuffle happens here."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                px_arr = _decode(bytes(data), fmt)
                h, w = px_arr.shape[:2]
                for py in range(h // patch):
                    for qx in range(w // patch):
                        tile = px_arr[
                            py * patch : (py + 1) * patch,
                            qx * patch : (qx + 1) * patch,
                        ]
                        raw = tile.tobytes()
                        rows.append(
                            {
                                "image_id": img_id,
                                "py": py,
                                "px": qx,
                                "patch": patch,
                                "data": raw if with_bytes else None,
                                "patch_hash": hashlib.md5(raw).hexdigest(),
                            }
                        )
            yield pd.DataFrame(rows, columns=list(_PATCH_COLS))

    return images.mapInPandas(gen, _PATCH_SCHEMA)


_PATCH_COLS = ("image_id", "py", "px", "patch", "data", "patch_hash")


def rebuild_patches(patches: DataFrame) -> DataFrame:
    """Inverse of ``extract_patches``: shuffle tiles by image_id and
    reassemble the full pixel array per group (grid dims come from the
    tile maxima — no metadata trust). Output per image:
    (image_id, n_patches, rebuilt_hash) with ``rebuilt_hash`` the md5
    of the row-major RGB bytes — the fingerprint a downstream
    patches-as-sequence consumer can audit against the source. One
    shuffle, keyed by image_id."""
    import hashlib

    def rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
        p = int(pdf["patch"].iloc[0])
        ny, nx = int(pdf["py"].max()) + 1, int(pdf["px"].max()) + 1
        full = np.zeros((ny * p, nx * p, 3), dtype=np.uint8)
        for py, qx, raw in zip(pdf["py"], pdf["px"], pdf["data"]):
            full[py * p : (py + 1) * p, qx * p : (qx + 1) * p] = (
                np.frombuffer(bytes(raw), dtype=np.uint8).reshape(p, p, 3)
            )
        return pd.DataFrame(
            {
                "image_id": [pdf["image_id"].iloc[0]],
                "n_patches": [len(pdf)],
                "rebuilt_hash": [hashlib.md5(full.tobytes()).hexdigest()],
            }
        )

    return patches.groupBy("image_id").applyInPandas(
        rebuild,
        "image_id string, n_patches int, rebuilt_hash string",
    )


def reassemble_verify(images: DataFrame, patch: int = 8) -> DataFrame:
    """Round-trip the patch pipeline: ``extract_patches`` → shuffle →
    ``rebuild_patches``, then compare each rebuilt md5 against a fresh
    decode of the original payload. Output per image:
    (image_id, n_patches, ok).

    The comparison hash is computed independently on both sides — the
    rebuild side never sees the original bytes — so a dropped, reordered
    or corrupted tile flips ``ok`` (tamper cases pinned in
    tests/test_images.py)."""
    import hashlib

    rebuilt = rebuild_patches(
        extract_patches(images, patch=patch, with_bytes=True)
    )

    def grid_hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                px_arr = _decode(bytes(data), fmt)
                h, w = px_arr.shape[:2]
                crop = px_arr[: h // patch * patch, : w // patch * patch]
                rows.append(
                    {
                        "image_id": img_id,
                        "orig_hash": hashlib.md5(crop.tobytes()).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=["image_id", "orig_hash"])

    orig = images.mapInPandas(grid_hash, "image_id string, orig_hash string")
    return rebuilt.join(orig, "image_id").select(
        "image_id",
        "n_patches",
        (F.col("rebuilt_hash") == F.col("orig_hash")).alias("ok"),
    )


def _perceptual_tiles(images: DataFrame, patch: int) -> DataFrame:
    """Hash-only tile rows keyed by the PERCEPTUAL sign pattern: per
    channel, a 4x4 grid of block means compared against the tile mean
    (phash-style), packed into one 48-bit hex key. Invariant to any
    noise that moves a block mean by less than its margin — in
    particular a lossy re-encode — while random-content tiles spread
    over the full 2^48 key space. Requires ``patch % 4 == 0`` (fixed
    4x4 grid, so the key width is patch-size independent)."""
    if patch % 4 != 0:
        raise ValueError("perceptual tile key needs patch % 4 == 0")
    bs = patch // 4

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                px_arr = _decode(bytes(data), fmt).astype(np.float64)
                h, w = px_arr.shape[:2]
                ny, nx = h // patch, w // patch
                grid = px_arr[: ny * patch, : nx * patch].reshape(
                    ny, 4, bs, nx, 4, bs, 3
                )
                blocks = grid.mean(axis=(2, 5))        # ny,4,nx,4,3
                tmean = blocks.mean(axis=(1, 3))       # ny,nx,3
                bits = blocks > tmean[:, None, :, None, :]
                # pack channel-major, then block-row, then block-col —
                # (ny, nx, 48); 48-bit ints are exact in float64
                flat = (
                    bits.transpose(0, 2, 4, 1, 3).reshape(ny, nx, 48)
                )
                key_int = flat.astype(np.float64) @ (
                    2.0 ** np.arange(47, -1, -1)
                )
                for yy in range(ny):
                    for xx in range(nx):
                        rows.append(
                            {
                                "image_id": img_id,
                                "py": yy,
                                "px": xx,
                                "patch": patch,
                                "data": None,
                                "patch_hash": format(
                                    int(key_int[yy, xx]), "012x"
                                ),
                            }
                        )
            yield pd.DataFrame(rows, columns=list(_PATCH_COLS))

    return images.mapInPandas(gen, _PATCH_SCHEMA)


def watermark_patches(
    images: DataFrame,
    patch: int = 8,
    min_images: int = 10,
    key: str = "exact",
) -> DataFrame:
    """Watermark/logo mining: find tiles whose content recurs across at
    least ``min_images`` distinct images — the repeated-overlay
    signature of watermarks, logos, and UI chrome in a scraped image
    corpus (a standard vision-training-data filter).

    ``key='exact'`` (md5 of raw tile bytes) detects more than lossless
    payloads: a block-aligned overlay stamped before a 4:4:4 JPEG
    encode decodes to ONE byte pattern regardless of the surrounding
    image (per-8x8-block DCT), so same-encoder lossy plants collapse
    into their own hot hash group (pinned in tests + the
    `watermark_detect` oracle). ``key='perceptual'`` switches to the
    48-bit sign-pattern key (``_perceptual_tiles``), which additionally
    merges copies of one overlay ACROSS encoders/settings — the png and
    jpeg plants land in one group (oracle
    `watermark_detect_perceptual`). Same plan shape either way.

    Scale shape: tiles leave the decode UDF as hashes only (no pixels
    in the shuffle); the hot-tile set comes from one map-side-partial
    distinct-count aggregation on patch_hash, is tiny by construction
    (a watermark is one hash, not millions), and joins back by
    broadcast. Output one row per stamped tile:
    (image_id, py, px, patch_hash, n_images)."""
    if key not in ("exact", "perceptual"):
        raise ValueError(f"unknown tile key {key!r}")
    # the tile table feeds BOTH the hot-set aggregation and the
    # join-back; without materializing it the decode UDF (the dominant
    # cost) would run twice. The hash-only rows are ~60 B per tile —
    # at 10^10 images that's a per-executor-partition spill-friendly
    # footprint, and on a cluster this localCheckpoint maps to writing
    # the patch-hash table once (which a real pipeline persists anyway)
    tiles = (
        extract_patches(images, patch=patch, with_bytes=False)
        if key == "exact"
        else _perceptual_tiles(images, patch)
    ).localCheckpoint(eager=False)
    hot = (
        tiles.groupBy("patch_hash")
        .agg(F.countDistinct("image_id").cast("int").alias("n_images"))
        .filter(F.col("n_images") >= min_images)
    )
    cand = tiles.join(F.broadcast(hot), "patch_hash").select(
        "image_id", "py", "px", "patch_hash", "n_images"
    )
    if key == "exact":
        return cand  # byte-identical content: self-verifying
    return _verify_tile_buckets(images, cand, patch, min_images)


def _verify_tile_buckets(
    images: DataFrame,
    cand: DataFrame,
    patch: int,
    min_images: int,
    tol: int = 6,
) -> DataFrame:
    """Exact-verify stage for perceptual candidate buckets — the same
    candidate→verify shape as the MinHash/LSH operators. A sign-pattern
    key is deliberately lossy, and smooth-gradient tiles (skies,
    vignettes, this corpus' synthetic gradient term) collide on
    structured patterns; a real overlay's members are near-IDENTICAL
    pixels, a gradient bucket's are unrelated ramps. So: fetch pixel
    bytes for the CANDIDATE tiles only (decode restricted to candidate
    images — a vanishing fraction of the corpus), group by bucket, and
    confirm members within L_inf ``tol`` of the bucket's elementwise
    median tile (tol=6 covers two independent ±3 lossy decodes);
    recount n_images over confirmed members. Gradient impostors differ
    by the full noise amplitude and drop out."""
    cand_ids = cand.select("image_id").distinct()
    tile_bytes = extract_patches(
        images.join(F.broadcast(cand_ids), "image_id"),
        patch=patch,
        with_bytes=True,
    ).select("image_id", "py", "px", "data")
    with_bytes = cand.join(tile_bytes, ["image_id", "py", "px"])

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        stack = np.stack(
            [
                np.frombuffer(bytes(b), dtype=np.uint8)
                for b in pdf["data"]
            ]
        ).astype(np.int16)
        med = np.median(stack, axis=0)
        keep = np.abs(stack - med).max(axis=1) <= tol
        out = pdf.loc[keep, ["image_id", "py", "px", "patch_hash"]]
        out = out.assign(n_images=out["image_id"].nunique())
        return out

    return (
        with_bytes.groupBy("patch_hash")
        .applyInPandas(
            verify,
            "image_id string, py int, px int, patch_hash string, "
            "n_images int",
        )
        .filter(F.col("n_images") >= min_images)
        .select("image_id", "py", "px", "patch_hash", "n_images")
    )


# -------------------------------------------------------- augmentation

_AUG_SCHEMA = "image_id string, aug string, out_w int, out_h int, bytes binary"


def _apply_aug(px_arr: np.ndarray, aug: str) -> np.ndarray:
    if aug == "hflip":
        return px_arr[:, ::-1]
    if aug == "vflip":
        return px_arr[::-1]
    if aug == "rot90":
        # 90° counter-clockwise in array space; (h, w) -> (w, h)
        return np.rot90(px_arr, k=1)
    if aug == "rot180":
        return np.rot90(px_arr, k=2)
    raise NotImplementedError(f"no augmentation {aug!r}")


def _invert_aug(px_arr: np.ndarray, aug: str) -> np.ndarray:
    if aug == "rot90":
        return np.rot90(px_arr, k=-1)
    # hflip / vflip / rot180 are involutions
    return _apply_aug(px_arr, aug)


def augment_images(
    images: DataFrame, augs: tuple[str, ...] = ("hflip", "rot90")
) -> DataFrame:
    """Deterministic geometric augmentation: decode once, emit one
    losslessly re-encoded PNG per (image, aug). hflip/vflip/rot180 keep
    (w, h); rot90 swaps to (h, w). Exactness: every transform is a pure
    index permutation and PNG is lossless, so the round trip through
    ``augment_verify`` is byte-exact even for JPEG sources (whose decode
    is itself deterministic). Map-only — each Arrow batch fans out
    len(augs) rows per input with no shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                px_arr = _decode(bytes(data), fmt)
                for aug in augs:
                    out = np.ascontiguousarray(_apply_aug(px_arr, aug))
                    rows.append(
                        {
                            "image_id": img_id,
                            "aug": aug,
                            "out_w": out.shape[1],
                            "out_h": out.shape[0],
                            "bytes": encode_png(out),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["image_id", "aug", "out_w", "out_h", "bytes"]
            )

    return images.mapInPandas(gen, _AUG_SCHEMA)


def augment_verify(
    images: DataFrame, augs: tuple[str, ...] = ("hflip", "rot90")
) -> DataFrame:
    """Invariant check for ``augment_images``: decode each augmented
    PNG, apply the INVERSE transform, and compare byte-exactly against
    an independent decode of the original payload (hash equi-join on
    image_id — augmented pixels and original pixels never meet in one
    task). Output: (image_id, aug, out_w, out_h, ok)."""
    import hashlib

    def inv_hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, aug, ow, oh, data in zip(
                pdf["image_id"], pdf["aug"], pdf["out_w"], pdf["out_h"],
                pdf["bytes"],
            ):
                back = np.ascontiguousarray(
                    _invert_aug(decode_png(bytes(data)), aug)
                )
                rows.append(
                    {
                        "image_id": img_id,
                        "aug": aug,
                        "out_w": int(ow),
                        "out_h": int(oh),
                        "inv_hash": hashlib.md5(back.tobytes()).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "aug", "out_w", "out_h", "inv_hash"],
            )

    def orig_hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                px_arr = np.ascontiguousarray(_decode(bytes(data), fmt))
                rows.append(
                    {
                        "image_id": img_id,
                        "orig_hash": hashlib.md5(px_arr.tobytes()).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=["image_id", "orig_hash"])

    inv = augment_images(images, augs=augs).mapInPandas(
        inv_hash,
        "image_id string, aug string, out_w int, out_h int, inv_hash string",
    )
    orig = images.mapInPandas(orig_hash, "image_id string, orig_hash string")
    return inv.join(orig, "image_id").select(
        "image_id",
        "aug",
        "out_w",
        "out_h",
        (F.col("inv_hash") == F.col("orig_hash")).alias("ok"),
    )


def cross_format_phash_check(
    images: DataFrame, quality: int = 90, max_hamming: int = 12
) -> DataFrame:
    """Cross-format dedup invariant: the SAME picture stored as PNG and
    as a lossy JPEG re-encode must land within ``max_hamming`` bits on
    the 8x8 average-phash — the property the whole phash-LSH dedup
    stack rests on when one upload is PNG and its mirror is JPEG (byte
    hashes see two different files; the perceptual hash must not).

    Per PNG row, inside one Arrow batch: decode -> phash the original
    pixels -> encode baseline JPEG at ``quality`` -> decode THAT ->
    phash again -> hamming distance. Map-only (mapInPandas), no
    shuffle; the corpus is deterministic so the distance column is a
    fixed measured value per row, and the gate invariant is
    ``within = hamming <= max_hamming``.

    Output: (image_id, hamming, within)."""
    from collections.abc import Iterator

    import pandas as pd

    from smart_crawler_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from smart_crawler_spark.functions.png import decode_png, perceptual_hash

    pngs = images.filter(F.col("fmt") == "png").select("image_id", "bytes")

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hams = [], []
            for image_id, data in zip(pdf["image_id"], pdf["bytes"]):
                px = decode_png(bytes(data))
                h0 = perceptual_hash(px)
                px2 = decode_jpeg(encode_jpeg(px, quality=quality))
                h1 = perceptual_hash(px2)
                ids.append(image_id)
                hams.append(int(bin(h0 ^ h1).count("1")))
            yield pd.DataFrame({"image_id": ids, "hamming": hams})

    out = pngs.mapInPandas(check, "image_id string, hamming int")
    return out.select(
        "image_id",
        "hamming",
        (F.col("hamming") <= max_hamming).alias("within"),
    )
