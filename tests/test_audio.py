"""Audio leg of the multimodal column model: WAV codec roundtrip,
windowed feature extraction, integer-factor resampling, and the
corrupt-payload path."""

import struct

import numpy as np
import pytest

from smart_crawler_spark.datagen.audio import (
    SAMPLE_RATE,
    audio_row,
    clip_samples,
    generate_audio,
)
from smart_crawler_spark.functions.wav import decode_wav, encode_wav
from smart_crawler_spark.operators.audio import audio_features, resample_audio


def test_wav_roundtrip_bit_exact():
    v = clip_samples(7)
    got, sr = decode_wav(encode_wav(v, SAMPLE_RATE))
    assert sr == SAMPLE_RATE
    assert got.dtype == np.int16
    assert np.array_equal(got, v)


def test_wav_rejects_unsupported():
    # float PCM (format tag 3) is an honest capability gate
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        decode_wav(blob)
    with pytest.raises(ValueError):
        decode_wav(b"nonsense bytes")
    with pytest.raises(ValueError):
        encode_wav(np.zeros(4, dtype=np.float32), 8000)


def test_features_match_numpy_reference(spark):
    feats = (
        audio_features(generate_audio(spark, 6), window=800)
        .orderBy("clip_id", "window_no")
        .collect()
    )
    assert len(feats) == 6 * 5 and all(r["ok"] for r in feats)
    by_key = {(r["clip_id"], r["window_no"]): r for r in feats}
    for idx in range(6):
        v = clip_samples(idx).astype(np.int64)
        for w in range(5):
            win = v[w * 800 : (w + 1) * 800]
            r = by_key[(f"clip{idx}", w)]
            assert r["rms"] == pytest.approx(
                round(float(np.sqrt((win * win).mean())), 4)
            )
            assert r["zcr"] == int(
                np.count_nonzero(win[1:] * win[:-1] < 0)
            )
            assert r["peak"] == int(np.abs(win).max())
            assert r["sum_amp"] == int(win.sum())


def test_corrupt_payload_flags_not_fails(spark):
    rows = [audio_row(0), audio_row(1)]
    rows[1]["bytes"] = b"RIFFgarbage"
    df = spark.createDataFrame(
        rows,
        schema="clip_id string, bytes binary, sr int, n_samples int, "
        "fmt string, checksum long",
    )
    out = audio_features(df).collect()
    bad = [r for r in out if not r["ok"]]
    assert {r["clip_id"] for r in bad} == {"clip1"}
    assert bad[0]["window_no"] == -1
    assert sum(1 for r in out if r["ok"]) == 5  # clip0's 5 windows


def test_checksum_mismatch_detected(spark):
    row = audio_row(3)
    row["checksum"] += 1
    df = spark.createDataFrame(
        [row],
        schema="clip_id string, bytes binary, sr int, n_samples int, "
        "fmt string, checksum long",
    )
    assert all(not r["ok"] for r in audio_features(df).collect())


def test_resample_decimates_exactly(spark):
    out = resample_audio(generate_audio(spark, 4), factor=2).collect()
    assert len(out) == 4
    for r in out:
        idx = int(r["clip_id"][4:])
        want = clip_samples(idx)[::2]
        got, sr = decode_wav(bytes(r["bytes"]))
        assert sr == SAMPLE_RATE // 2
        assert r["n_samples"] == want.size
        assert np.array_equal(got, want)
        assert r["checksum"] == int(want.astype(np.int64).sum())


def test_truncated_fmt_chunk_is_valueerror_not_structerror(spark):
    """A RIFF/WAVE header with a short fmt chunk must surface as the
    documented ValueError contract (struct.error would escape the
    operators' corrupt-payload handling and kill the whole job)."""
    bad = (
        b"RIFF" + struct.pack("<I", 18) + b"WAVE"
        + b"fmt " + struct.pack("<I", 6) + b"\x01\x00\x01\x00\x40\x1f"
    )
    with pytest.raises(ValueError):
        decode_wav(bad)
    rows = [audio_row(0), audio_row(1)]
    rows[1]["bytes"] = bad
    df = spark.createDataFrame(
        rows,
        schema="clip_id string, bytes binary, sr int, n_samples int, "
        "fmt string, checksum long",
    )
    out = audio_features(df).collect()
    assert {r["clip_id"] for r in out if not r["ok"]} == {"clip1"}
    # resample drops the undecodable clip instead of dying
    kept = resample_audio(df, factor=2).collect()
    assert {r["clip_id"] for r in kept} == {"clip0"}


def test_fingerprint_dedup_volume_invariant_and_corrupt_drop(spark):
    """A 7/8-gain copy merges with its source (different bytes and
    checksum, same sign sequence); different period classes never
    merge; an undecodable payload is dropped, not fatal."""
    from smart_crawler_spark.datagen.audio import audio_row, generate_audio
    from smart_crawler_spark.operators.audio import audio_fingerprint_dedup

    clips = generate_audio(spark, 16, vol_every=8)
    # the planted dup really differs at the byte level from its source
    r6, r7 = audio_row(6), audio_row(7, vol_every=8)
    assert r6["bytes"] != r7["bytes"] and r6["checksum"] != r7["checksum"]

    corrupt = spark.createDataFrame(
        [("clipX", b"RIFFbroken", 8000, 0, "wav", 0)], clips.schema
    )
    got = {
        (r["clip_id"], r["group_id"], r["n_clips"])
        for r in audio_fingerprint_dedup(clips.unionByName(corrupt)).collect()
    }
    # 16 clips over 25 period classes: only the planted pairs group
    assert got == {
        ("clip6", "clip6", 2),
        ("clip7", "clip6", 2),
        ("clip14", "clip14", 2),
        ("clip15", "clip14", 2),
    }
