"""Deterministic image+caption corpus (driver input_hint schema).

Table: (image_id string, bytes binary, w int, h int, fmt string,
caption string, phash bigint). Pixels are a pure function of the image
index (seeded PCG64 per id), so any two runs — and the Python oracle —
agree byte-for-byte. fmt='png' rows carry a real PNG (this repo's pure
numpy codec; lossless → decode allclose is exact). fmt='jpeg' rows carry
a real baseline JPEG (functions/jpeg.py) at quality 98 — chosen so the
lossy roundtrip stays above the PSNR>=40dB invariant even on this
corpus' half-noise pixels (measured worst case 43.5 dB); the stored
phash of a JPEG row is the POST-ROUNDTRIP hash, so the decode-verify
invariant (recomputed == stored) holds by construction, stamped logos
and all (see image_row).

Generation is distributed: ``spark.range(n)`` → ``mapInPandas`` — no
driver-side materialization, scales to any corpus size.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from smart_crawler_spark.functions.jpeg import encode_jpeg
from smart_crawler_spark.functions.png import encode_png, perceptual_hash

JPEG_QUALITY = 98  # keeps the lossy roundtrip >= 40 dB on this corpus

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)

_WORDS = (
    "amber basalt cedar delta ember fjord garnet harbor indigo juniper "
    "krypton lagoon marble nectar onyx prairie quartz russet sienna tundra"
).split()


def image_pixels(idx: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels for image index ``idx``."""
    rng = np.random.Generator(np.random.PCG64(10_000_019 + idx))
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # add smooth structure so phash isn't pure noise
    yy, xx = np.mgrid[0:h, 0:w]
    grad = ((yy * 255 // max(h - 1, 1) + xx * (idx % 7 + 1)) % 256).astype(np.uint8)
    return (base // 2 + grad[..., None] // 2).astype(np.uint8)


def image_caption(idx: int) -> str:
    rng = np.random.Generator(np.random.PCG64(20_000_003 + idx))
    words = [_WORDS[i] for i in rng.integers(0, len(_WORDS), size=6)]
    return f"Image {idx}: " + " ".join(words)


# Fixed 8x8 RGB logo tile, closed-form so any run agrees byte-for-byte.
# Wrap-free ramp (max 7*28 + 7*6 + 22 = 238 <= 255): a mod-256 wrap
# would park a 2x2-block mean exactly ON the tile mean and make the
# perceptual sign-pattern key fragile under JPEG decode noise; with the
# 28/6 slope pair every 2x2-block mean clears the tile mean by >= 10
# (min |28a + 6b| over block offsets a, b in {-3, -1, 1, 3}) —
# comfortably above the ±3 q98 decode noise.
_LOGO = (
    np.arange(8)[:, None, None] * 28
    + np.arange(8)[None, :, None] * 6
    + np.array([0, 11, 22])[None, None, :]
).astype(np.uint8)


def image_row(
    idx: int,
    jpeg_every: int = 0,
    flat_every: int = 0,
    dup_every: int = 0,
    short_caption_every: int = 0,
    bomb_every: int = 0,
    logo_every: int = 0,
    text_meta_every: int = 0,
) -> dict:
    """One deterministic corpus row. Optional planted rows for the
    filter/dedup oracles (all OFF by default, so every existing corpus
    is byte-identical to before):
    - ``text_meta_every``: every k-th PNG row (by content index, so
      dup rows copy their source's metadata and stay byte-identical;
      JPEG rows carry no tEXt) gets two tEXt metadata chunks — an
      Author with a PII-looking email and a Software tag — for the
      metadata audit/strip oracles. Ignored on bomb rows.
    - ``flat_every``: every k-th image is a solid color (zero contrast,
      zero entropy) — the quality filter must drop exactly these.
    - ``dup_every``: every k-th image carries the FULL content (pixels,
      dims, caption, phash, bytes) of its predecessor index — a planted
      byte-identical duplicate pair; only image_id differs.
    - ``short_caption_every``: every k-th caption degenerates to the
      one-word 'thumb' (the alt-text-less thumbnail case) — the
      caption gate must drop exactly these.
    - ``bomb_every``: every k-th image is a 1024x768 solid-color PNG —
      a decompression bomb (hundreds of decoded pixels per payload
      byte); the decode-bomb guard must flag exactly these. Takes
      precedence over the other plant rules.
    - ``logo_every``: every k-th image gets the fixed 8x8 ``_LOGO``
      tile stamped at pixel block (8:16, 8:16) — patch grid cell
      (py=1, px=1), present at every corpus dimension — the planted
      watermark for the repeated-patch miner. The stamp lands on BOTH
      formats: PNG rows keep the exact logo bytes, and JPEG rows all
      decode the logo block to ONE other byte pattern (the tile is
      8x8-block-aligned and the codec is 4:4:4, so its DCT roundtrip
      is independent of the surrounding image — measured: one distinct
      decoded tile across all JPEG plants). The miner therefore sees
      two hot hash groups, one per format."""
    content_idx = idx
    if dup_every and idx % dup_every == dup_every - 1:
        content_idx = idx - 1
    if bomb_every and content_idx % bomb_every == bomb_every - 1:
        w, h = 1024, 768
        px = np.full((h, w, 3), (29 * content_idx) % 256, dtype=np.uint8)
        return {
            "image_id": f"img{idx}",
            "bytes": encode_png(px),
            "w": w,
            "h": h,
            "fmt": "png",
            "caption": image_caption(content_idx),
            "phash": perceptual_hash(px),
        }
    w = 32 + (content_idx % 4) * 16
    h = 24 + (content_idx % 3) * 16
    fmt = (
        "jpeg"
        if jpeg_every and content_idx % jpeg_every == jpeg_every - 1
        else "png"
    )
    if flat_every and content_idx % flat_every == flat_every - 1:
        px = np.full((h, w, 3), (17 * content_idx) % 256, dtype=np.uint8)
    else:
        px = image_pixels(content_idx, w, h)
    if logo_every and content_idx % logo_every == logo_every - 1:
        px = px.copy()
        px[8:16, 8:16] = _LOGO
    if fmt == "png":
        data = encode_png(px)
        if (
            text_meta_every
            and content_idx % text_meta_every == text_meta_every - 1
        ):
            # keyed on content_idx so a dup_every row copies its
            # source's metadata too — byte-identical dup pairs survive
            from smart_crawler_spark.functions.png import add_text_chunks

            data = add_text_chunks(
                data,
                [
                    ("Author", f"user{content_idx}@example.com"),
                    ("Software", "smartgen 1.0"),
                ],
            )
    else:
        data = encode_jpeg(px, quality=JPEG_QUALITY)
    caption = image_caption(content_idx)
    if (
        short_caption_every
        and content_idx % short_caption_every == short_caption_every - 1
    ):
        caption = "thumb"
    # the stored phash describes the PAYLOAD AS DECODED: identical to
    # phash(px) for lossless PNG, and the post-roundtrip hash for JPEG —
    # making the decode-verify invariant (recomputed phash == stored)
    # true BY CONSTRUCTION rather than "measured on this corpus" (a
    # stamped logo block can park one avg-hash block exactly on the
    # luma-mean threshold, where q98 noise flips a bit — seen at
    # img209 under logo_every=7)
    if fmt == "jpeg":
        from smart_crawler_spark.functions.jpeg import decode_jpeg

        ph = perceptual_hash(decode_jpeg(data))
    else:
        ph = perceptual_hash(px)
    return {
        "image_id": f"img{idx}",
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": ph,
    }


def generate_images(
    spark: SparkSession,
    n: int,
    jpeg_every: int = 10,
    partitions: int | None = None,
    flat_every: int = 0,
    dup_every: int = 0,
    short_caption_every: int = 0,
    bomb_every: int = 0,
    logo_every: int = 0,
    text_meta_every: int = 0,
) -> DataFrame:
    # ceil-divide into ~16-image tasks: the pure-Python JPEG encode is
    # the slowest per-row work in the suite, and floor division
    # serialized any corpus under 512 images into ONE task
    parts = partitions or min(max(1, -(-n // 16)), 64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    image_row(
                        int(i), jpeg_every, flat_every, dup_every,
                        short_caption_every, bomb_every, logo_every,
                        text_meta_every,
                    )
                    for i in pdf["id"]
                ]
            )

    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, IMAGES_SCHEMA)


def ingest_batch_row(j: int, jpeg_every: int = 10) -> dict:
    """One row of an incoming ingest batch (id ``new{j}``), cycling the
    four cases an image ingest meets: j%4==0 an exact re-crawl of
    corpus content j (byte-identical payload); j%4==1 the same content
    re-encoded in the OTHER codec (decode the corpus payload, encode
    the decoded pixels — what a mirror site serving recompressed copies
    produces); j%4==2 a 2x box-downscaled THUMBNAIL of the corpus
    payload (same caption — the gallery-page case; the 8x8 avg-phash
    survives exact area downscale to within hamming 8, measured on the
    full corpus); j%4==3 novel content (index 1_000_000+j, never in
    any corpus). Cases 1 and 2 are dedupable only perceptually."""
    import numpy as np

    from smart_crawler_spark.functions.jpeg import decode_jpeg
    from smart_crawler_spark.functions.png import decode_png

    if j % 4 == 3:
        r = image_row(1_000_000 + j, jpeg_every)
    else:
        r = image_row(j, jpeg_every)
        if j % 4 in (1, 2):
            px = (
                decode_jpeg(r["bytes"])
                if r["fmt"] == "jpeg"
                else decode_png(r["bytes"])
            )
            if j % 4 == 1:
                if r["fmt"] == "png":
                    data = encode_jpeg(px, quality=JPEG_QUALITY)
                    r.update(
                        bytes=data,
                        fmt="jpeg",
                        phash=perceptual_hash(decode_jpeg(data)),
                    )
                else:
                    r.update(
                        bytes=encode_png(px),
                        fmt="png",
                        phash=perceptual_hash(px),
                    )
            else:
                h, w = px.shape[:2]
                th = np.round(
                    px[: h // 2 * 2, : w // 2 * 2]
                    .reshape(h // 2, 2, w // 2, 2, 3)
                    .astype(np.float64)
                    .mean(axis=(1, 3))
                ).astype(np.uint8)
                r.update(
                    bytes=encode_png(th),
                    fmt="png",
                    w=w // 2,
                    h=h // 2,
                    phash=perceptual_hash(th),
                )
    r["image_id"] = f"new{j}"
    return r


def generate_ingest_batch(
    spark: SparkSession, n: int, jpeg_every: int = 10
) -> DataFrame:
    parts = min(max(1, -(-n // 16)), 64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [ingest_batch_row(int(i), jpeg_every) for i in pdf["id"]]
            )

    return spark.range(0, n, numPartitions=parts).mapInPandas(
        gen, IMAGES_SCHEMA
    )


def benchmark_row(c: int) -> dict:
    """One eval-benchmark row: the EXACT pixels of corpus content index
    ``c``, always PNG-encoded — so a PNG corpus row leaks byte-exactly
    while a JPEG corpus row of the same content leaks only perceptually
    (same pixels, different codec) and must be caught by the phash
    path of ``benchmark_image_contamination``."""
    w = 32 + (c % 4) * 16
    h = 24 + (c % 3) * 16
    px = image_pixels(c, w, h)
    return {
        "image_id": f"bench{c}",
        "bytes": encode_png(px),
        "w": w,
        "h": h,
        "fmt": "png",
        "caption": image_caption(c),
        "phash": perceptual_hash(px),
    }


def generate_benchmark_images(
    spark: SparkSession, n: int, every: int = 25, offset: int = 24
) -> DataFrame:
    """Deterministic eval-benchmark set: corpus content indices
    ``c < n`` with ``c % every == offset`` (so contamination is a pure
    arithmetic rule the DuckDB oracle can state)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                benchmark_row(int(i)) for i in pdf["id"] if i % every == offset
            ]
            if rows:
                yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=4).mapInPandas(gen, IMAGES_SCHEMA)


# ---------------------------------------------------------------- video

VIDEOS_SCHEMA = (
    "video_id string, bytes binary, fmt string, n_frames int, w int, h int"
)


def video_frame_pixels(vid: int, frame: int, w: int, h: int) -> np.ndarray:
    """Deterministic frame pixels (same generator family as images)."""
    return image_pixels(30_000_017 + vid * 1000 + frame, w, h)


def scene_frame_pixels(
    vid: int, frame: int, w: int, h: int, scene_every: int
) -> np.ndarray:
    """Frame pixels WITH temporal structure: frames share their scene's
    base image (scene index = frame // se, where se = scene_every +
    vid % 3 so cut positions vary across the corpus) plus a +2-per-frame
    brightness drift — adjacent in-scene frames differ by MAD <= 2,
    adjacent cross-scene frames are independent draws (MAD ~= 85)."""
    se = scene_every + vid % 3
    base = video_frame_pixels(vid, (frame // se) * 1_000_003, w, h)
    return np.clip(
        base.astype(np.int16) + 2 * (frame % se), 0, 255
    ).astype(np.uint8)


def video_row(
    vid: int,
    n_frames: int = 12,
    fmt: str = "y4m",
    scene_every: int | None = None,
) -> dict:
    from smart_crawler_spark.functions.mjpeg import encode_mjpeg
    from smart_crawler_spark.functions.y4m import encode_y4m

    w = 32 + (vid % 3) * 16
    h = 24 + (vid % 2) * 16
    px = (
        (lambda f: scene_frame_pixels(vid, f, w, h, scene_every))
        if scene_every
        else (lambda f: video_frame_pixels(vid, f, w, h))
    )
    frames = np.stack([px(f) for f in range(n_frames)])
    if fmt == "y4m":
        data = encode_y4m(frames)
    elif fmt == "mjpeg":
        # q98: the synthetic half-noise frames need q97+ for the 40 dB
        # invariant (same finding as the still-image jpeg corpus)
        data = encode_mjpeg(frames, quality=98)
    else:
        raise NotImplementedError(f"no video encoder for fmt={fmt!r}")
    return {
        "video_id": f"vid{vid}",
        "bytes": data,
        "fmt": fmt,
        "n_frames": n_frames,
        "w": w,
        "h": h,
    }


def generate_videos(
    spark: SparkSession,
    n: int,
    n_frames: int = 12,
    partitions: int | None = None,
    fmt: str = "y4m",
    scene_every: int | None = None,
) -> DataFrame:
    """Deterministic video clips, generated distributed — uncompressed
    .y4m or compressed AVI/MJPEG (fmt='mjpeg'). ``scene_every`` plants
    temporal scene structure (see scene_frame_pixels)."""
    parts = partitions or min(max(1, -(-n // 4)), 64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    video_row(int(i), n_frames, fmt, scene_every)
                    for i in pdf["id"]
                ]
            )

    return spark.range(0, n, numPartitions=parts).mapInPandas(
        gen, VIDEOS_SCHEMA
    )
