"""Pure-numpy PNG codec + phash: roundtrip exactness and determinism."""

import numpy as np
import pytest

from smart_crawler_spark.datagen.images import image_pixels, image_row
from smart_crawler_spark.functions.png import (
    decode_png,
    encode_png,
    perceptual_hash,
    psnr,
)


def test_roundtrip_exact():
    px = image_pixels(7, 48, 40)
    out = decode_png(encode_png(px))
    assert out.shape == px.shape
    assert np.array_equal(out, px)
    assert psnr(px, out) == float("inf")  # lossless: PSNR >= 40dB trivially


def test_deterministic():
    assert encode_png(image_pixels(3, 32, 24)) == encode_png(image_pixels(3, 32, 24))
    r1, r2 = image_row(5), image_row(5)
    assert r1["bytes"] == r2["bytes"] and r1["phash"] == r2["phash"]
    assert r1["caption"] == r2["caption"]


def test_phash_locality():
    px = image_pixels(11, 64, 64)
    noisy = px.copy()
    noisy[::9, ::9] ^= 3  # tiny perturbation
    h1, h2 = perceptual_hash(px), perceptual_hash(noisy)
    ham = bin((h1 ^ h2) & ((1 << 64) - 1)).count("1")
    assert ham <= 4
    other = perceptual_hash(image_pixels(12, 64, 64))
    assert bin((h1 ^ other) & ((1 << 64) - 1)).count("1") > ham


def test_bad_input():
    with pytest.raises(ValueError):
        decode_png(b"not a png")
    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4), dtype=np.uint8))


def test_jpeg_rows_are_real_jpegs():
    row = image_row(9, jpeg_every=10)
    assert row["fmt"] == "jpeg"
    assert row["bytes"][:2] == b"\xff\xd8" and row["bytes"][-2:] == b"\xff\xd9"


# ---------------------------------------------------------------- jpeg


def test_jpeg_roundtrip_psnr_and_phash():
    from smart_crawler_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from smart_crawler_spark.functions.png import perceptual_hash, psnr

    for idx, (w, h) in [(9, (48, 40)), (3, (33, 27)), (7, (8, 8))]:
        px = image_pixels(idx, w, h)
        dec = decode_jpeg(encode_jpeg(px, quality=98))
        assert dec.shape == px.shape
        assert psnr(px, dec) >= 40.0
    # phash stability under quality-98 recompression (the dedup invariant)
    px = image_pixels(19, 64, 56)
    dec = decode_jpeg(encode_jpeg(px, quality=98))
    assert perceptual_hash(px) == perceptual_hash(dec)


def test_jpeg_quality_dial_and_determinism():
    from smart_crawler_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from smart_crawler_spark.functions.png import psnr

    px = image_pixels(5, 48, 40)
    lo, hi = encode_jpeg(px, quality=50), encode_jpeg(px, quality=95)
    assert len(lo) < len(hi)  # coarser quantization compresses harder
    assert psnr(px, decode_jpeg(lo)) < psnr(px, decode_jpeg(hi))
    assert encode_jpeg(px, quality=95) == hi  # bitwise deterministic


def test_jpeg_decoder_gates():
    from smart_crawler_spark.functions.jpeg import decode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # progressive SOF2 must gate, not silently mis-decode
    bad = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    with pytest.raises(NotImplementedError):
        decode_jpeg(bad + b"\xff\xd9")


def test_png_chunk_walk_strict_framing():
    """_iter_chunks (via text_chunks) must raise on truncated or
    IEND-less PNGs instead of yielding a partial chunk list — the
    metadata audit would otherwise under-report on damaged payloads."""
    from smart_crawler_spark.functions.png import (
        add_text_chunks,
        encode_png,
        text_chunks,
    )

    good = add_text_chunks(
        encode_png(image_pixels(3, 16, 12)), [("Author", "x")]
    )
    assert text_chunks(good) == [("Author", "x")]

    # chunk length overrunning the buffer
    with pytest.raises(ValueError, match="truncated PNG"):
        text_chunks(good[:-6])
    # partial chunk header at the tail
    with pytest.raises(ValueError, match="truncated PNG"):
        text_chunks(good[: len(good) - 10])
    # stream that simply stops before IEND (drop the whole IEND chunk)
    with pytest.raises(ValueError, match="without IEND"):
        text_chunks(good[:-12])
