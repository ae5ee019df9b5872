"""Audio-payload operators over (clip_id, bytes, sr, n_samples, fmt,
checksum) tables — the audio leg of the multimodal column model
(images/videos live in operators/images.py).

Decoded waveforms NEVER become a Spark type: payloads stay opaque
``binary`` columns and every decode/feature/resample step runs inside
Arrow-batched ``mapInPandas`` on pure-numpy kernels (functions/wav.py),
so the plan scales by adding input partitions — no driver round-trip,
no row-at-a-time Python.

Feature definitions (per fixed-size window, hop == window):
    rms      = sqrt(mean(v^2))            (rounded 4 dp)
    zcr      = #{i >= 1 in window : v[i] * v[i-1] < 0}
    peak     = max(|v|)
    sum_amp  = exact integer sum(v)       (DC component, un-rounded)
``ok`` checks the lossless PCM roundtrip: decoded length == n_samples
and the exact integer sample sum == the stored checksum.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from smart_crawler_spark.functions.wav import decode_wav, encode_wav

FEATURES_SCHEMA = (
    "clip_id string, window_no int, rms double, zcr int, peak int, "
    "sum_amp long, ok boolean"
)


def audio_features(audio: DataFrame, window: int = 800) -> DataFrame:
    """Decode each clip and emit one row per analysis window.

    Trailing samples that do not fill a whole window are dropped (the
    standard frame-analysis convention). Undecodable payloads yield a
    single (window_no=-1, ok=false) row instead of failing the job.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, data, n_samples, checksum in zip(
                pdf["clip_id"], pdf["bytes"], pdf["n_samples"], pdf["checksum"]
            ):
                try:
                    v, _sr = decode_wav(bytes(data))
                except (ValueError, NotImplementedError):
                    rows.append(
                        {"clip_id": cid, "window_no": -1, "rms": 0.0,
                         "zcr": 0, "peak": 0, "sum_amp": 0, "ok": False}
                    )
                    continue
                v64 = v.astype(np.int64)
                ok = bool(
                    v.size == int(n_samples)
                    and int(v64.sum()) == int(checksum)
                )
                n_win = v.size // window
                w = v64[: n_win * window].reshape(n_win, window)
                rms = np.round(np.sqrt((w * w).mean(axis=1)), 4)
                zcr = np.count_nonzero(w[:, 1:] * w[:, :-1] < 0, axis=1)
                peak = np.abs(w).max(axis=1)
                for i in range(n_win):
                    rows.append(
                        {
                            "clip_id": cid,
                            "window_no": i,
                            "rms": float(rms[i]),
                            "zcr": int(zcr[i]),
                            "peak": int(peak[i]),
                            "sum_amp": int(w[i].sum()),
                            "ok": ok,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "clip_id", "window_no", "rms", "zcr", "peak",
                    "sum_amp", "ok",
                ],
            )

    return audio.mapInPandas(gen, FEATURES_SCHEMA)


def resample_audio(audio: DataFrame, factor: int) -> DataFrame:
    """Integer-factor decimation: keep every ``factor``-th sample and
    re-encode at sr/factor. Same schema as the input table (checksum
    recomputed for the decimated signal). Undecodable payloads are
    dropped from the output (the filter-out convention for a resample
    stage; audio_features is the op that REPORTS corrupt clips)."""
    if factor < 1:
        raise ValueError("factor must be >= 1")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, data, fmt in zip(pdf["clip_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    v, sr = decode_wav(bytes(data))
                except (ValueError, NotImplementedError):
                    continue
                d = v[::factor]
                rows.append(
                    {
                        "clip_id": cid,
                        "bytes": encode_wav(d, sr // factor),
                        "sr": sr // factor,
                        "n_samples": int(d.size),
                        "fmt": fmt,
                        "checksum": int(d.astype(np.int64).sum()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "clip_id", "bytes", "sr", "n_samples", "fmt", "checksum",
                ],
            )

    return audio.mapInPandas(gen, audio.schema)


def audio_fingerprint_dedup(audio: DataFrame) -> DataFrame:
    """Volume-invariant acoustic near-dup grouping: fingerprint each
    clip by the md5 of its packed SIGN sequence (sample >= 0 per
    sample), then group clips sharing a fingerprint — the audio leg of
    the per-modality dedup suite (text minhash/simhash, image phash,
    embedding LSH). Gain changes never flip a sample's nonneg/neg side
    (positive scaling keeps nonneg nonneg; floor division keeps
    negatives negative), so re-levelled copies of one recording merge
    while their PCM bytes, RMS, peak and checksum all differ.

    Scale shape is the phash-dedup plan: the decode is map-only (one
    clip in flight per row, never whole-corpus state) and only
    (clip_id, 16-byte fingerprint) enters the shuffle — a 10^8-clip
    corpus groups on ~3 GB of keys regardless of audio volume.
    Undecodable payloads are dropped (the resample convention).

    Output: (clip_id, group_id = lexicographic-min clip_id of the
    group, n_clips) — one row per clip that belongs to a group of 2+.
    """
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, data in zip(pdf["clip_id"], pdf["bytes"]):
                try:
                    v, _sr = decode_wav(bytes(data))
                except (ValueError, NotImplementedError):
                    continue
                bits = np.packbits(v >= 0)
                rows.append(
                    {
                        "clip_id": cid,
                        "fp": hashlib.md5(bits.tobytes()).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=["clip_id", "fp"])

    fps = audio.select("clip_id", "bytes").mapInPandas(
        gen, "clip_id string, fp string"
    )
    from pyspark.sql import functions as F

    groups = (
        fps.groupBy("fp")
        .agg(
            F.min("clip_id").alias("group_id"),
            F.count(F.lit(1)).cast("int").alias("n_clips"),
        )
        .filter(F.col("n_clips") >= 2)
    )
    return fps.join(groups, "fp").select("clip_id", "group_id", "n_clips")
