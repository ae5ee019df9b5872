"""Minimal pure-python AVI/MJPEG video codec — a REAL compressed video
format for this codec-less sandbox, closing the honest
NotImplementedError gate in operators/images.py for one compressed leg.
Each frame is an independent baseline JFIF image (functions/jpeg.py's
real DCT/huffman codec), wrapped in the RIFF-AVI container layout every
ffmpeg/VLC understands ('MJPG' fourcc, one '00dc' chunk per frame,
idx1 keyframe index).

Subset: single video stream, 24-bit RGB, no audio, no OpenDML
extensions. The decoder walks the RIFF tree tolerantly (skips unknown
chunks), so third-party MJPEG-in-AVI files using this baseline layout
decode too; files outside the subset raise ValueError, and genuinely
inter-frame codecs (h264 etc.) remain NotImplementedError gates in
operators/images.py.
"""

from __future__ import annotations

import struct

import numpy as np

from smart_crawler_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_mjpeg(
    frames: np.ndarray, fps: int = 25, quality: int = 92
) -> bytes:
    """(n, h, w, 3) uint8 RGB frames -> AVI/MJPEG bytes."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("expected (n, h, w, 3) uint8")
    n, h, w = frames.shape[:3]
    jpegs = [encode_jpeg(frames[i], quality=quality) for i in range(n)]
    max_sz = max((len(j) for j in jpegs), default=0)

    avih = struct.pack(
        "<10I4x4x4x4x",
        1_000_000 // fps,      # dwMicroSecPerFrame
        max_sz * fps,          # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        0x10,                  # AVIF_HASINDEX
        n, 0, 1, max_sz, w, h,
    )
    strh = struct.pack(
        "<4s4sI2H8I2h2h",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,                # dwScale / dwRate => fps
        0, n, max_sz,
        0xFFFFFFFF,            # dwQuality: default
        0,
        0, 0, w, h,            # rcFrame
    )
    strf = struct.pack(
        "<I2i2H2I2i2I", 40, w, h, 1, 24, 0x47504A4D,  # 'MJPG'
        w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)
    # idx1 offsets are relative to the start of the movi list type tag
    idx, off = [], 4
    for j in jpegs:
        idx.append(struct.pack("<4s3I", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def decode_mjpeg(data: bytes) -> tuple[np.ndarray, dict]:
    """AVI/MJPEG bytes -> ((n, h, w, 3) uint8 RGB, header dict)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI file")
    w = h = 0
    fps = 25

    def walk(pos: int, end: int):
        nonlocal w, h, fps
        payloads = []
        end = min(end, len(data))  # a lying RIFF size can't walk past EOF
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = pos + 8
            if body + size > len(data):
                raise ValueError("truncated chunk")
            if fourcc == b"LIST":
                payloads += walk(body + 4, body + size)
            elif fourcc == b"avih" and size >= 40:
                w, h = struct.unpack("<2I", data[body + 32 : body + 40])
            elif fourcc == b"strh" and size >= 32:
                if data[body : body + 4] == b"vids":
                    handler = data[body + 4 : body + 8]
                    if handler not in (b"MJPG", b"mjpg"):
                        raise NotImplementedError(
                            f"AVI video handler {handler!r}: only MJPG"
                        )
                    scale, rate = struct.unpack(
                        "<2I", data[body + 20 : body + 28]
                    )
                    if scale:
                        fps = rate // scale or fps
            elif fourcc in (b"00dc", b"00db") and size > 0:
                payloads.append(data[body : body + size])
            pos = body + size + (size % 2)
        return payloads

    jpegs = walk(12, 8 + struct.unpack("<I", data[4:8])[0])
    frames = [decode_jpeg(j) for j in jpegs]
    if frames:
        h, w = frames[0].shape[:2]
    return (
        np.stack(frames) if frames else np.empty((0, h, w, 3), np.uint8),
        {"w": w, "h": h, "fps": fps, "n_frames": len(frames)},
    )
