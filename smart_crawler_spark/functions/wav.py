"""Pure-numpy WAV (RIFF/WAVE) codec for 16-bit PCM mono audio.

Written from the public RIFF/WAVE container spec (the same role
libsndfile plays in a production pipeline; the sandbox has no audio
libs, so the container logic is implemented directly). PCM is lossless:
an encode→decode roundtrip reproduces the samples bit-exactly, which is
what the audio decode-verify invariant checks.

Scope (honest capability gates, mirroring functions/jpeg.py):
supported  — format tag 1 (integer PCM), 16 bits/sample, 1 channel.
unsupported → NotImplementedError: float PCM (tag 3), ADPCM/ALAW/MULAW,
multi-channel, other bit depths.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Serialize int16 mono ``samples`` as a RIFF/WAVE byte string."""
    if samples.dtype != np.int16:
        raise ValueError(f"expected int16 samples, got {samples.dtype}")
    if samples.ndim != 1:
        raise ValueError("expected a mono 1-D sample array")
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH",
        1,                    # wFormatTag = integer PCM
        1,                    # nChannels
        sample_rate,          # nSamplesPerSec
        sample_rate * 2,      # nAvgBytesPerSec
        2,                    # nBlockAlign
        16,                   # wBitsPerSample
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE byte string → (int16 sample array, sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, 8 + struct.unpack("<I", data[4:8])[0]
    fmt_tag = channels = bits = rate = None
    samples = None
    while pos + 8 <= min(end, len(data)):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        chunk = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            # a short fmt chunk must surface as ValueError (the
            # corrupt-payload contract callers catch), not struct.error
            if len(chunk) < 16:
                raise ValueError("truncated fmt chunk")
            fmt_tag, channels, rate = struct.unpack("<HHI", chunk[:8])
            bits = struct.unpack("<H", chunk[14:16])[0]
        elif cid == b"data":
            samples = chunk
        # chunks are word-aligned: odd sizes carry a pad byte
        pos += 8 + size + (size & 1)
    if fmt_tag is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    if fmt_tag != 1:
        raise NotImplementedError(f"non-PCM WAV format tag {fmt_tag}")
    if bits != 16 or channels != 1:
        raise NotImplementedError(
            f"only 16-bit mono PCM supported (got {bits}-bit, "
            f"{channels} channel(s))"
        )
    return np.frombuffer(samples, dtype="<i2").astype(np.int16), int(rate)
