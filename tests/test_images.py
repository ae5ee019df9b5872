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


# ---------------------------------------------------------------- round 4:
# header sniffing, aspect bucketing, quality filter, exact byte dedup


def test_sniff_dims_header_only():
    """Header parsers agree with the real codecs and never decode
    pixels: feed them truncated payloads that keep only the header."""
    from smart_crawler_spark.functions.headers import sniff_dims
    from smart_crawler_spark.functions.jpeg import encode_jpeg
    from smart_crawler_spark.functions.png import encode_png

    px = image_pixels(3, 48, 40)
    png, jpg = encode_png(px), encode_jpeg(px, quality=98)
    assert sniff_dims(png) == ("png", 48, 40)
    assert sniff_dims(jpg) == ("jpeg", 48, 40)
    # header-only: the dims live in the first bytes; truncating the
    # pixel payload must not matter (PNG IHDR = first 24 bytes; JPEG
    # SOF lands before the scan data)
    assert sniff_dims(png[:24]) == ("png", 48, 40)
    assert sniff_dims(jpg[:600]) == ("jpeg", 48, 40)
    assert sniff_dims(b"garbage") is None
    assert sniff_dims(b"\xff\xd8\xff\xd9") is None  # JPEG with no SOF


def test_aspect_buckets_match_rule(spark, images):
    """Bucket assignment == nearest-ln-ratio over the ladder, dims
    sniffed from headers == stored metadata dims."""
    import math

    from smart_crawler_spark.operators.images import (
        DEFAULT_ASPECT_BUCKETS,
        aspect_buckets,
    )

    rows = aspect_buckets(images).collect()
    assert len(rows) == 40
    meta = {r["image_id"]: (r["w"], r["h"]) for r in images.collect()}
    ordered = sorted(DEFAULT_ASPECT_BUCKETS, key=lambda b: b[0] / b[1])
    for r in rows:
        assert (r["w"], r["h"]) == meta[r["image_id"]]
        want = min(
            ordered,
            key=lambda b: abs(
                math.log(r["w"] / r["h"]) - math.log(b[0] / b[1])
            ),
        )
        assert r["bucket"] == f"{want[0]}x{want[1]}", r


def test_aspect_threshold_gap():
    """Every corpus ln-ratio is far (>1e-3) from every bucket threshold,
    so JVM-vs-DuckDB libm ulp differences can never flip a bucket."""
    import math

    from smart_crawler_spark.operators.images import DEFAULT_ASPECT_BUCKETS

    ordered = sorted(DEFAULT_ASPECT_BUCKETS, key=lambda b: b[0] / b[1])
    logs = [math.log(bw / bh) for bw, bh in ordered]
    mids = [(a + b) / 2 for a, b in zip(logs, logs[1:])]
    dims = {(32 + (i % 4) * 16, 24 + (i % 3) * 16) for i in range(500)}
    for w, h in dims:
        lr = math.log(w / h)
        assert min(abs(lr - m) for m in mids) > 1e-3, (w, h)


def test_quality_filter_drops_flats(spark):
    from smart_crawler_spark.operators.images import image_quality_stats

    corpus = generate_images(spark, 70, jpeg_every=10, flat_every=7)
    rows = image_quality_stats(corpus).collect()
    assert len(rows) == 70
    for r in rows:
        idx = int(r["image_id"].removeprefix("img"))
        flat = idx % 7 == 6
        assert r["keep"] == (not flat), r
        if flat:
            assert r["contrast"] < 1.0 and r["entropy"] < 1.0, r
        else:
            assert r["contrast"] > 8.0 and r["entropy"] > 3.0, r


def test_exact_dedup_finds_planted_pairs(spark):
    from smart_crawler_spark.operators.images import exact_dup_groups

    corpus = generate_images(spark, 70, jpeg_every=10, dup_every=7)
    rows = {r["image_id"]: r for r in exact_dup_groups(corpus).collect()}
    assert len(rows) == 70
    for img_id, r in rows.items():
        idx = int(img_id.removeprefix("img"))
        if idx % 7 == 6:
            partner = idx - 1
        elif idx % 7 == 5 and idx + 1 < 70:
            partner = idx + 1
        else:
            partner = None
        if partner is None:
            assert (r["group_rep"], r["group_size"]) == (img_id, 1), r
        else:
            assert r["group_size"] == 2, r
            assert r["group_rep"] == min(img_id, f"img{partner}"), r


def test_joint_dedup_requires_both_phash_and_caption(spark):
    """AND semantics pinned on hand-built rows (decode=False path):
    same phash + same caption = dup; same caption alone (stock-photo
    boilerplate) and near phash alone (recaptioned copy) are NOT."""
    from smart_crawler_spark.operators.images import joint_dup_groups

    rows = [
        # a/b: identical phash, identical caption -> one group
        ("a", "sunset over water", 0x1234),
        ("b", "sunset over water", 0x1234),
        # c/d: same boilerplate caption, far phash -> singletons
        ("c", "stock photo", 0x0),
        ("d", "stock photo", 0xFFFFFFFFFFFFFFFF - 1),
        # e: phash within hamming 1 of a, different caption -> singleton
        ("e", "a boat at dusk", 0x1235),
        # f/g: hamming-2 phash, caption equal after normalization
        ("f", "Red  Panda", 0x00F0),
        ("g", "red panda", 0x00F3),
    ]
    df = spark.createDataFrame(rows, ["image_id", "caption", "phash"])
    got = {
        r["image_id"]: r["component"]
        for r in joint_dup_groups(df, max_hamming=6, decode=False).collect()
    }
    assert got == {
        "a": "a", "b": "a", "c": "c", "d": "d", "e": "e",
        "f": "f", "g": "f",
    }


def test_joint_dedup_real_decode_plant_rule(spark):
    """decode=True on real bytes: with dup_every=5 the planted
    full-content copies (and only they) collapse."""
    from smart_crawler_spark.operators.images import joint_dup_groups

    corpus = generate_images(spark, 40, jpeg_every=10, dup_every=5)
    got = {
        r["image_id"]: r["component"]
        for r in joint_dup_groups(corpus, max_hamming=6).collect()
    }
    assert len(got) == 40
    for i in range(40):
        if i % 5 == 4:
            want = min(f"img{i-1}", f"img{i}")
        elif i % 5 == 3:
            want = min(f"img{i}", f"img{i+1}")
        else:
            want = f"img{i}"
        assert got[f"img{i}"] == want, (i, got[f"img{i}"])


def test_shard_pack_layout_invariants_on_real_bytes(spark):
    """Pack REAL mixed PNG/JPEG payloads: the layout must equal the
    driver-side replay of the same (md5-bucket, id) stream, assets are
    atomic (offset+size contiguous in stream order), and each shard
    holds at most one overflowing asset with total size < budget +
    max_asset."""
    import hashlib

    from smart_crawler_spark.operators.images import shard_pack

    corpus = generate_images(spark, 60, jpeg_every=3)
    budget = 4096
    got = {r["image_id"]: r for r in shard_pack(corpus, budget).collect()}
    sizes = {
        r["image_id"]: len(r["bytes"])
        for r in corpus.select("image_id", "bytes").collect()
    }

    def bucket(i):
        return int(hashlib.md5(i.encode()).hexdigest()[:8], 16) % 64

    order = sorted(sizes, key=lambda i: (bucket(i), i))
    cum = 0
    per_shard_overflows = {}
    for iid in order:
        r = got[iid]
        assert r["n_bytes"] == sizes[iid]
        assert r["shard_id"] == cum // budget, iid
        assert r["shard_offset"] == cum % budget, iid
        want_ovf = (cum + sizes[iid] - 1) // budget > cum // budget
        assert r["overflows"] == want_ovf, iid
        if want_ovf:
            per_shard_overflows[r["shard_id"]] = (
                per_shard_overflows.get(r["shard_id"], 0) + 1
            )
        cum += sizes[iid]
    assert all(v == 1 for v in per_shard_overflows.values())
    # shard size bound: budget + max asset - 1
    by_shard = {}
    for iid in order:
        by_shard.setdefault(got[iid]["shard_id"], 0)
        by_shard[got[iid]["shard_id"]] += sizes[iid]
    assert max(by_shard.values()) < budget + max(sizes.values())


def test_jpeg_quality_estimator_recovers_encode_quality(spark):
    """The DQT-matching estimator must recover the exact encode quality
    across the scale's two regimes (q<50 and q>=50), flag the match as
    exact, and pass PNGs through with nulls."""
    import numpy as np

    from smart_crawler_spark.datagen.images import image_pixels
    from smart_crawler_spark.functions.jpeg import encode_jpeg
    from smart_crawler_spark.functions.png import encode_png
    from smart_crawler_spark.operators.images import jpeg_quality_estimates

    px = image_pixels(3, 48, 40)
    rows = [
        (f"q{q}", bytearray(encode_jpeg(px, quality=q)))
        for q in (30, 50, 75, 92, 98)
    ] + [("png", bytearray(encode_png(px)))]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {
        r["image_id"]: r for r in jpeg_quality_estimates(df).collect()
    }
    for q in (30, 50, 75, 92, 98):
        r = got[f"q{q}"]
        assert (r["fmt"], r["q_est"], r["exact"]) == ("jpeg", q, True), r
    assert got["png"]["fmt"] is None and got["png"]["q_est"] is None


def test_caption_gate_dims_and_caption_rules(spark):
    """The gate reads dims from headers (must equal the generator's)
    and drops exactly: too-narrow, too-short, planted one-word
    captions. No decode, no shuffle in the plan."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import caption_gate

    corpus = generate_images(spark, 60, jpeg_every=10, short_caption_every=5)
    out = {r["image_id"]: r for r in caption_gate(corpus).collect()}
    for i in range(60):
        r = out[f"img{i}"]
        assert (r["w"], r["h"]) == (32 + (i % 4) * 16, 24 + (i % 3) * 16)
        want_keep = i % 4 != 0 and i % 3 != 0 and i % 5 != 4
        assert r["keep"] == want_keep, (i, r)
        assert r["n_words"] == (1 if i % 5 == 4 else 8)
    plan = caption_gate(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_caption_gate_unparseable_payload_is_drop_not_null(spark):
    from smart_crawler_spark.operators.images import caption_gate

    df = spark.createDataFrame(
        [("bad", bytearray(b"not an image"), "a fine long caption here")],
        "image_id string, bytes binary, caption string",
    )
    (r,) = caption_gate(df).collect()
    assert r["keep"] is False and r["w"] is None


def test_decode_bomb_guard(spark):
    """Planted 1024x768 solid PNGs are flagged by BOTH rules (oversize
    at 0.25 MP, >50 decoded px/byte); organic images keep; unparseable
    payloads fail closed; the whole guard is map-only."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import decode_bomb_guard

    corpus = generate_images(spark, 36, jpeg_every=10, bomb_every=9)
    out = {
        r["image_id"]: r
        for r in decode_bomb_guard(
            corpus, max_megapixels=0.25, max_px_per_byte=50.0
        ).collect()
    }
    for i in range(36):
        r = out[f"img{i}"]
        if i % 9 == 8:
            assert r["oversize"] and r["ratio_bomb"] and not r["keep"], r
            assert (r["w"], r["h"]) == (1024, 768)
            # the bomb signature itself: tiny payload, huge decode
            assert r["n_bytes"] < 1024 * 768 / 50
        else:
            assert r["keep"] and not r["oversize"] and not r["ratio_bomb"], r
    plan = (
        decode_bomb_guard(corpus)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_decode_bomb_guard_fails_closed(spark):
    from smart_crawler_spark.operators.images import decode_bomb_guard

    df = spark.createDataFrame(
        [("bad", bytearray(b"not an image"))],
        "image_id string, bytes binary",
    )
    (r,) = decode_bomb_guard(df).collect()
    assert r["keep"] is False and r["oversize"] and r["ratio_bomb"]


def test_extract_patches_grid_and_content(spark):
    from smart_crawler_spark.operators.images import extract_patches

    corpus = generate_images(spark, 12, jpeg_every=5)
    rows = extract_patches(corpus, patch=8).collect()
    # grid size per image follows the dims rule exactly (no partials)
    by_img = {}
    for r in rows:
        by_img.setdefault(r["image_id"], []).append(r)
    for i in range(12):
        w, h = 32 + (i % 4) * 16, 24 + (i % 3) * 16
        tiles = by_img[f"img{i}"]
        assert len(tiles) == (w // 8) * (h // 8)
        assert {(t["py"], t["px"]) for t in tiles} == {
            (y, x) for y in range(h // 8) for x in range(w // 8)
        }
        assert all(len(t["data"]) == 8 * 8 * 3 for t in tiles)
    # a PNG tile's bytes equal the source pixels at that grid cell
    t = next(
        t for t in by_img["img0"] if (t["py"], t["px"]) == (1, 2)
    )
    want = image_pixels(0, 32, 24)[8:16, 16:24].tobytes()
    assert bytes(t["data"]) == want


def test_reassemble_verify_catches_corruption(spark):
    from smart_crawler_spark.operators.images import (
        extract_patches,
        reassemble_verify,
        rebuild_patches,
    )

    corpus = generate_images(spark, 10, jpeg_every=4)
    ok = reassemble_verify(corpus, patch=8)
    assert ok.count() == 10 and ok.filter(~F.col("ok")).count() == 0
    # tamper between the stages: the rebuilt fingerprint must move
    patches = extract_patches(corpus, patch=8)
    clean = {
        r["image_id"]: r["rebuilt_hash"]
        for r in rebuild_patches(patches).collect()
    }
    zeroed = patches.withColumn(
        "data",
        F.when(
            (F.col("image_id") == "img3")
            & (F.col("py") == 0) & (F.col("px") == 0),
            F.lit(bytes(8 * 8 * 3)),
        ).otherwise(F.col("data")),
    )
    tampered = {
        r["image_id"]: r["rebuilt_hash"]
        for r in rebuild_patches(zeroed).collect()
    }
    assert tampered["img3"] != clean["img3"]
    assert {k: v for k, v in tampered.items() if k != "img3"} == {
        k: v for k, v in clean.items() if k != "img3"
    }
    # a DROPPED tile changes the fingerprint too (and the count)
    dropped = rebuild_patches(
        patches.filter(
            ~((F.col("image_id") == "img5") & (F.col("py") == 1))
        )
    ).collect()
    r5 = next(r for r in dropped if r["image_id"] == "img5")
    assert r5["rebuilt_hash"] != clean["img5"]


def test_watermark_patches_exact_plant(spark):
    from smart_crawler_spark.operators.images import watermark_patches

    corpus = generate_images(spark, 70, jpeg_every=10, logo_every=7)
    got = watermark_patches(corpus, patch=8, min_images=4).collect()
    png_ids = {
        f"img{i}" for i in range(70) if i % 7 == 6 and i % 10 != 9
    }
    # the single jpeg plant (img69) is its own hash group of size 1 —
    # below min_images, so only the png group is hot
    assert {r["image_id"] for r in got} == png_ids
    assert all((r["py"], r["px"]) == (1, 1) for r in got)
    assert all(r["n_images"] == len(png_ids) for r in got)
    # with two jpeg plants in range (69, 139) the jpeg group becomes
    # hot too — in a DIFFERENT hash group than the png plants
    # (block-aligned 4:4:4 decode: one byte pattern per format)
    wide = generate_images(spark, 140, jpeg_every=10, logo_every=7)
    hot = watermark_patches(wide, patch=8, min_images=2).collect()
    by_id = {r["image_id"]: r for r in hot}
    jpeg_ids = {"img69", "img139"}
    assert set(by_id) == {
        f"img{i}" for i in range(140) if i % 7 == 6
    }
    assert all(by_id[i]["n_images"] == 2 for i in jpeg_ids)
    assert by_id["img69"]["patch_hash"] == by_id["img139"]["patch_hash"]
    assert by_id["img69"]["patch_hash"] != by_id["img6"]["patch_hash"]


def test_augment_verify_all_ops_exact(spark):
    from smart_crawler_spark.operators.images import (
        augment_images,
        augment_verify,
    )

    corpus = generate_images(spark, 8, jpeg_every=3)
    augs = ("hflip", "vflip", "rot90", "rot180")
    av = augment_verify(corpus, augs=augs).collect()
    assert len(av) == 8 * 4 and all(r["ok"] for r in av)
    # dim rule: rot90 swaps, others keep
    for r in av:
        i = int(r["image_id"][3:])
        w, h = 32 + (i % 4) * 16, 24 + (i % 3) * 16
        if r["aug"] == "rot90":
            assert (r["out_w"], r["out_h"]) == (h, w)
        else:
            assert (r["out_w"], r["out_h"]) == (w, h)
    # the augmented payload really is the permuted pixels (not a
    # re-verification of the same code path): check one row directly
    from smart_crawler_spark.functions.png import decode_png

    row = (
        augment_images(corpus, augs=("hflip",))
        .filter(F.col("image_id") == "img0")
        .collect()[0]
    )
    import numpy as np

    got = decode_png(bytes(row["bytes"]))
    assert np.array_equal(got, image_pixels(0, 32, 24)[:, ::-1])


def test_augment_unknown_op_gates(spark):
    from smart_crawler_spark.operators.images import augment_images

    corpus = generate_images(spark, 2)
    with pytest.raises(Exception, match="augmentation"):
        augment_images(corpus, augs=("sepia",)).collect()


def test_watermark_perceptual_merges_across_encoders(spark):
    from smart_crawler_spark.operators.images import watermark_patches

    corpus = generate_images(spark, 140, jpeg_every=10, logo_every=7)
    planted = {f"img{i}" for i in range(140) if i % 7 == 6}
    got = watermark_patches(
        corpus, patch=8, min_images=5, key="perceptual"
    ).collect()
    assert {r["image_id"] for r in got} == planted
    # ONE merged group: every plant reports the total count and the
    # png/jpeg members share the sign-pattern key
    assert all(r["n_images"] == len(planted) for r in got)
    assert len({r["patch_hash"] for r in got}) == 1
    assert all((r["py"], r["px"]) == (1, 1) for r in got)
    # bad key name gates
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown tile key"):
        watermark_patches(corpus, key="phash")
    with _pytest.raises(ValueError, match="patch % 4"):
        watermark_patches(corpus, patch=6, key="perceptual")


def test_benchmark_image_contamination_exact_and_phash_paths(spark):
    from smart_crawler_spark.datagen.images import generate_benchmark_images
    from smart_crawler_spark.operators.images import (
        benchmark_image_contamination,
    )

    corpus = generate_images(spark, 400, jpeg_every=10, dup_every=7)
    bench = generate_benchmark_images(spark, 400, every=25, offset=24)
    got = {
        r["image_id"]: (r["bench_id"], r["method"])
        for r in benchmark_image_contamination(corpus, bench).collect()
    }
    expected = {}
    for i in range(400):
        c = i - 1 if i % 7 == 6 else i
        if c % 25 == 24:
            expected[f"img{i}"] = (
                f"bench{c}",
                "phash" if c % 10 == 9 else "exact",
            )
    assert got == expected
    # both paths fired: JPEG leaks are perceptual-only, PNG byte-exact
    methods = {m for _, m in got.values()}
    assert methods == {"exact", "phash"}


def test_benchmark_image_contamination_plan(spark):
    from smart_crawler_spark.datagen.images import generate_benchmark_images
    from smart_crawler_spark.operators.images import (
        benchmark_image_contamination,
    )

    corpus = generate_images(spark, 40, jpeg_every=10)
    bench = generate_benchmark_images(spark, 40, every=25, offset=24)
    plan = (
        benchmark_image_contamination(corpus, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # benchmark side broadcasts on both probes; never a cartesian
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2
    assert "SortMergeJoin" not in plan


def test_image_pyramid_exact_box_average_and_plan(spark):
    import numpy as np

    from smart_crawler_spark.datagen.images import image_pixels
    from smart_crawler_spark.functions.png import decode_png
    from smart_crawler_spark.operators.images import image_pyramid

    corpus = generate_images(spark, 12, jpeg_every=0)
    out = image_pyramid(corpus, factors=(1, 2, 4)).collect()
    assert len(out) == 36
    rows = {(r["image_id"], r["level"]): r for r in out}
    for i in range(12):
        w = 32 + (i % 4) * 16
        h = 24 + (i % 3) * 16
        px = image_pixels(i, w, h)
        for f in (1, 2, 4):
            r = rows[(f"img{i}", f)]
            assert (r["w"], r["h"]) == (w // f, h // f)
            assert r["mean_ok"] is True
            got = decode_png(bytes(r["bytes"]))
            ref = np.round(
                px.reshape(h // f, f, w // f, f, 3)
                .astype(np.float64)
                .mean(axis=(1, 3))
            ).astype(np.uint8)
            assert np.array_equal(got, ref)
            if f == 1:
                assert np.array_equal(got, px)
    # map-only: no Exchange anywhere in the plan
    plan = (
        image_pyramid(corpus)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_caption_boilerplate_threshold_boundary(spark):
    from smart_crawler_spark.operators.images import caption_boilerplate

    corpus = generate_images(
        spark, 70, jpeg_every=10, dup_every=7, short_caption_every=5
    )
    got = {
        r["image_id"]: r["boilerplate"]
        for r in caption_boilerplate(corpus, min_images=3).collect()
    }
    for i in range(70):
        c = i - 1 if i % 7 == 6 else i
        assert got[f"img{i}"] is (c % 5 == 4), i
    # dup pairs (count 2) flip to flagged at min_images=2
    got2 = {
        r["image_id"]: r["boilerplate"]
        for r in caption_boilerplate(corpus, min_images=2).collect()
    }
    assert got2["img6"] and got2["img5"]  # the first dup pair
    # hot set broadcasts; corpus side never sort-merge-joins
    plan = (
        caption_boilerplate(corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_scene_cuts_structured_vs_unstructured(spark):
    """scene_cuts finds exactly the planted boundaries on structured
    clips (both codecs: MJPEG decode noise stays under the threshold)
    and flags EVERY adjacent pair on an unstructured clip, where each
    frame is an independent draw."""
    from smart_crawler_spark.datagen.images import generate_videos
    from smart_crawler_spark.operators.images import scene_cuts

    structured = generate_videos(
        spark, 6, n_frames=12, fmt="mjpeg", scene_every=4
    )
    got = {
        (r["video_id"], r["cut_frame"], r["scene_no"])
        for r in scene_cuts(structured).collect()
    }
    want = {
        (f"vid{v}", c * (4 + v % 3), c)
        for v in range(6)
        for c in (1, 2)
        if c * (4 + v % 3) < 12
    }
    assert got == want

    unstructured = generate_videos(spark, 2, n_frames=6, fmt="y4m")
    got_u = {
        (r["video_id"], r["cut_frame"])
        for r in scene_cuts(unstructured).collect()
    }
    assert got_u == {(f"vid{v}", f) for v in range(2) for f in range(1, 6)}


def test_scene_cuts_unknown_codec_gates(spark):
    import pytest as _pytest

    from smart_crawler_spark.operators.images import scene_cuts

    df = spark.createDataFrame(
        [("vidx", b"\x00\x01", "h264")], "video_id string, bytes binary, fmt string"
    )
    with _pytest.raises(Exception, match="no video decoder"):
        scene_cuts(df).collect()


def test_metadata_audit_and_strip_roundtrip(spark):
    """tEXt plant -> audit finds exactly the planted pairs; strip
    removes them all with pixels byte-identical; JPEG rows pass
    through; unplanted corpora stay byte-identical to before."""
    from smart_crawler_spark.datagen.images import generate_images, image_row
    from smart_crawler_spark.functions.png import text_chunks
    from smart_crawler_spark.operators.images import (
        metadata_audit,
        strip_metadata_verify,
    )

    # plant changes only the flagged rows
    assert image_row(0)["bytes"] == image_row(0, text_meta_every=3)["bytes"]
    planted = image_row(2, text_meta_every=3)["bytes"]
    assert text_chunks(planted) == [
        ("Author", "user2@example.com"),
        ("Software", "smartgen 1.0"),
    ]

    corpus = generate_images(spark, 30, jpeg_every=10, text_meta_every=3)
    audit = {
        (r["image_id"], r["key"], r["value"])
        for r in metadata_audit(corpus).collect()
    }
    want_ids = [i for i in range(30) if i % 3 == 2 and i % 10 != 9]
    assert audit == {
        (f"img{i}", k, v)
        for i in want_ids
        for k, v in (
            ("Author", f"user{i}@example.com"),
            ("Software", "smartgen 1.0"),
        )
    }

    strip = strip_metadata_verify(corpus).collect()
    assert len(strip) == 30
    for r in strip:
        assert r["n_after"] == 0 and r["pixels_ok"]
        i = int(r["image_id"][3:])
        assert r["n_before"] == (2 if i in want_ids else 0)
