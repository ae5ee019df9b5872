"""Deterministic audio corpus: 16-bit PCM mono WAV clips.

Table: (clip_id string, bytes binary, sr int, n_samples int, fmt string,
checksum long). Samples are a pure INTEGER function of (clip index,
sample index) — a sawtooth whose period and amplitude derive from the
clip index — so the DuckDB oracle reproduces every sample exactly with
integer SQL arithmetic (no trig, no float rounding ambiguity):

    p(a)   = 40 + (a % 25) * 8          # samples per cycle
    amp(a) = 12000 + (a % 5) * 3000     # peak amplitude
    v(a,t) = ((t % p) * 2 * amp) // (p - 1) - amp

``checksum`` is the exact integer sum of all samples, carried so the
decode-verify invariant can check the lossless PCM roundtrip without
re-running the generator.

Generation is distributed (``spark.range`` → ``mapInPandas``), same as
the image/video corpora.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from smart_crawler_spark.functions.wav import encode_wav

SAMPLE_RATE = 8000
N_SAMPLES = 4000  # 0.5 s per clip

AUDIO_SCHEMA = (
    "clip_id string, bytes binary, sr int, n_samples int, fmt string, "
    "checksum long"
)


def clip_samples(idx: int, n: int = N_SAMPLES) -> np.ndarray:
    """Deterministic int16 samples for clip ``idx`` (integer sawtooth)."""
    p = 40 + (idx % 25) * 8
    amp = 12000 + (idx % 5) * 3000
    t = np.arange(n, dtype=np.int64)
    v = (t % p) * (2 * amp) // (p - 1) - amp
    return v.astype(np.int16)


def audio_row(idx: int, vol_every: int | None = None) -> dict:
    if vol_every and idx % vol_every == vol_every - 1:
        # planted volume near-dup: clip idx-1 at 7/8 gain (floor
        # division keeps every sample's sign, so any sign-based
        # fingerprint matches the source exactly while the PCM bytes,
        # checksum, RMS and peak all differ)
        v = (clip_samples(idx - 1).astype(np.int64) * 7 // 8).astype(
            np.int16
        )
    else:
        v = clip_samples(idx)
    return {
        "clip_id": f"clip{idx}",
        "bytes": encode_wav(v, SAMPLE_RATE),
        "sr": SAMPLE_RATE,
        "n_samples": int(v.size),
        "fmt": "wav",
        "checksum": int(v.astype(np.int64).sum()),
    }


def generate_audio(
    spark: SparkSession,
    n: int,
    partitions: int | None = None,
    vol_every: int | None = None,
) -> DataFrame:
    parts = partitions or min(max(1, -(-n // 8)), 64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [audio_row(int(i), vol_every) for i in pdf["id"]]
            )

    return spark.range(0, n, numPartitions=parts).mapInPandas(
        gen, AUDIO_SCHEMA
    )
