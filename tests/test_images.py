"""Image-payload operators: decode invariant (allclose/PSNR), metadata
verification, resize plumbing, phash near-dup, stub gating."""

import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.datagen.images import generate_images, image_pixels
from smart_crawler_spark.operators.images import (
    decode_features,
    phash_near_dup_pairs,
    resize_images,
    sample_frames,
    verify_against_reference,
    verify_decode_invariant,
)


@pytest.fixture(scope="module")
def images(spark):
    return generate_images(spark, 40, jpeg_every=10).localCheckpoint()


def test_decode_invariant_all_rows(spark, images):
    inv = verify_decode_invariant(images)
    png, jpg = inv.filter("fmt = 'png'"), inv.filter("fmt = 'jpeg'")
    assert png.count() == 36 and jpg.count() == 4
    assert inv.filter(~F.col("invariant_ok")).count() == 0
    # jpeg at quality 98 keeps dims AND the exact phash (measured
    # roundtrip hamming 0 on this corpus)
    assert jpg.filter("ok and invariant_ok").count() == 4


def test_decode_matches_reference_pixels(spark, images):
    rep = verify_against_reference(images)
    # png lossless: exact equality; jpeg lossy: PSNR >= 40 dB
    assert rep.filter("allclose").count() == 36
    assert rep.filter("psnr_ok").count() == 40
    assert rep.filter("psnr_ok is null").count() == 0


def test_unsupported_gate_raises(spark, images):
    weird = images.withColumn(
        "fmt", F.when(F.col("fmt") == "jpeg", F.lit("tiff")).otherwise(F.col("fmt"))
    )
    with pytest.raises(Exception, match="no decoder"):
        decode_features(weird, on_unsupported="error").collect()
    n = decode_features(weird, on_unsupported="skip").count()
    assert n == 36


def test_resize_shapes(spark, images):
    out = resize_images(images, 16, 12)
    rows = out.collect()
    assert len(rows) == 40  # jpeg rows decode and resize too
    from smart_crawler_spark.functions.png import decode_png

    px = decode_png(bytes(rows[0]["bytes"]))
    assert px.shape == (12, 16, 3)


def test_phash_near_dup_finds_duplicates(spark):
    import pandas as pd

    from smart_crawler_spark.functions.png import perceptual_hash

    base = image_pixels(3, 64, 48)
    noisy = base.copy()
    noisy[::13, ::11] ^= 1
    other = image_pixels(4, 64, 48)
    pdf = pd.DataFrame(
        {
            "image_id": ["a", "a_noisy", "b"],
            "phash": [
                perceptual_hash(base),
                perceptual_hash(noisy),
                perceptual_hash(other),
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    pairs = {
        (r["id_a"], r["id_b"]) for r in phash_near_dup_pairs(df, 4).collect()
    }
    assert ("a", "a_noisy") in pairs
    assert ("a", "b") not in pairs and ("a_noisy", "b") not in pairs


def test_y4m_roundtrip_and_sampling(spark):
    import numpy as np

    from smart_crawler_spark.datagen.images import (
        generate_videos,
        video_frame_pixels,
    )
    from smart_crawler_spark.functions.png import decode_png, psnr
    from smart_crawler_spark.functions.y4m import decode_y4m, encode_y4m

    # codec roundtrip: YCbCr 4:4:4 quantization only (>= 40 dB)
    frames = np.stack([video_frame_pixels(1, f, 48, 40) for f in range(4)])
    dec, meta = decode_y4m(encode_y4m(frames))
    assert dec.shape == frames.shape and meta["n_frames"] == 4
    assert min(psnr(frames[i], dec[i]) for i in range(4)) >= 40.0

    # distributed sampling: every 5th of 12 frames -> 0, 5, 10
    vids = generate_videos(spark, 6, n_frames=12)
    out = sample_frames(vids, every_n=5).collect()
    assert len(out) == 18
    assert sorted({r["frame_no"] for r in out}) == [0, 5, 10]
    r = next(x for x in out if x["video_id"] == "vid2" and x["frame_no"] == 5)
    got = decode_png(bytes(r["bytes"]))
    ref = video_frame_pixels(2, 5, r["w"], r["h"])
    assert got.shape == ref.shape and psnr(ref, got) >= 40.0


def test_y4m_decoder_gates():
    from smart_crawler_spark.functions.y4m import decode_y4m

    with pytest.raises(ValueError):
        decode_y4m(b"not a y4m")
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C420\n")


def test_mjpeg_roundtrip_and_mixed_corpus_sampling(spark):
    import numpy as np

    from smart_crawler_spark.datagen.images import (
        generate_videos,
        video_frame_pixels,
    )
    from smart_crawler_spark.functions.mjpeg import decode_mjpeg, encode_mjpeg
    from smart_crawler_spark.functions.png import decode_png, psnr

    # codec roundtrip: container + real per-frame baseline JPEG (q98
    # holds the 40 dB invariant on the half-noise synthetic frames)
    frames = np.stack([video_frame_pixels(1, f, 48, 40) for f in range(4)])
    dec, meta = decode_mjpeg(encode_mjpeg(frames, quality=98))
    assert dec.shape == frames.shape and meta["n_frames"] == 4
    assert meta["w"] == 48 and meta["h"] == 40 and meta["fps"] == 25
    assert min(psnr(frames[i], dec[i]) for i in range(4)) >= 40.0

    # MIXED corpus: y4m and mjpeg clips in one frame-sampling pass
    mixed = generate_videos(spark, 4, n_frames=12, fmt="y4m").unionByName(
        generate_videos(spark, 4, n_frames=12, fmt="mjpeg").withColumn(
            "video_id", F.concat(F.lit("m"), F.col("video_id"))
        )
    )
    out = sample_frames(mixed, every_n=5).collect()
    assert len(out) == 24  # 8 clips x frames {0, 5, 10}
    for vid_prefix in ("vid2", "mvid2"):
        r = next(
            x for x in out
            if x["video_id"] == vid_prefix and x["frame_no"] == 10
        )
        got = decode_png(bytes(r["bytes"]))
        ref = video_frame_pixels(2, 10, r["w"], r["h"])
        assert got.shape == ref.shape and psnr(ref, got) >= 40.0


def test_mjpeg_decoder_gates():
    import numpy as np
    import struct

    from smart_crawler_spark.functions.mjpeg import decode_mjpeg, encode_mjpeg

    with pytest.raises(ValueError):
        decode_mjpeg(b"not an avi")
    with pytest.raises(ValueError):  # truncated mid-chunk
        good = encode_mjpeg(np.zeros((2, 16, 16, 3), np.uint8))
        decode_mjpeg(good[: len(good) // 2])
    # a non-MJPG video stream is an honest NotImplementedError
    good = encode_mjpeg(np.zeros((1, 16, 16, 3), np.uint8))
    h264 = good.replace(b"vidsMJPG", b"vidsH264")
    with pytest.raises(NotImplementedError, match="only MJPG"):
        decode_mjpeg(h264)


def test_video_compressed_codec_gate(spark):
    import pandas as pd

    vids = spark.createDataFrame(
        pd.DataFrame(
            {"video_id": ["v0"], "bytes": [b"\x00\x01"], "fmt": ["h264"]}
        )
    )
    with pytest.raises(Exception, match="no video decoder"):
        sample_frames(vids, every_n=2).collect()




def test_phash_lsh_recall_guarantee(spark):
    """Pairs at hamming exactly max_hamming whose differing bits are
    spread across MORE than 4 of the old 16-bit blocks — the pigeonhole
    guarantee (max_hamming+1 blocks) must still find them."""
    base = 0x0123456789ABCDEF
    # 6 flipped bits in 6 different 8-bit regions (bits 0,16,32,48,8,24):
    # under 4x16-bit blocking ALL four blocks differ -> old scheme missed
    spread = base ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48)
                     | (1 << 8) | (1 << 24))
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["a", "b", "far"],
                "phash": pd.array(
                    [base, spread, base ^ ((1 << 63) - 1)], dtype="int64"
                ),
            }
        )
    )
    from smart_crawler_spark.operators.images import phash_near_dup_pairs

    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_near_dup_pairs(df, max_hamming=6).collect()
    }
    assert ("a", "b", 6) in got
    assert all(p[:2] != ("a", "far") and p[:2] != ("b", "far") for p in got)
