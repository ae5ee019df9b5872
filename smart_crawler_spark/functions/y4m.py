"""Minimal pure-numpy YUV4MPEG2 (.y4m) video codec — the uncompressed
public interchange format (the `mjpegtools` header dialect every ffmpeg
understands). Gives the video-payload pipeline a REAL decodable format
in this codec-less sandbox: frames round-trip through YCbCr 4:4:4 with
only uint8 quantization error (PSNR ~48 dB), so the PSNR>=40dB payload
invariant is checkable end-to-end. Compressed codecs (h264 etc.) remain
honest NotImplementedError gates in operators/images.py.

Layout: ``YUV4MPEG2 W<w> H<h> F<n>:<d> Ip A1:1 C444\n`` then per frame
``FRAME\n`` + three full-resolution planes (Y, Cb, Cr), uint8.
Color transform: BT.601 full-range (the JPEG matrix — shared with
functions/jpeg.py).
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def _rgb_to_ycc(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255).astype(
        np.uint8
    )


def _ycc_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n, h, w, 3) uint8 RGB frames -> .y4m bytes (C444)."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("expected (n, h, w, 3) uint8")
    n, h, w = frames.shape[:3]
    out = bytearray(
        b"%s W%d H%d F%d:%d Ip A1:1 C444\n" % (_MAGIC, w, h, fps[0], fps[1])
    )
    for i in range(n):
        ycc = _rgb_to_ycc(frames[i])
        out += b"FRAME\n"
        for c in range(3):
            out += ycc[..., c].tobytes()
    return bytes(out)


def decode_y4m(data: bytes) -> tuple[np.ndarray, dict]:
    """.y4m bytes -> ((n, h, w, 3) uint8 RGB, header dict)."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream")
    params: dict[str, str] = {}
    for tok in data[len(_MAGIC) + 1 : nl].split(b" "):
        if tok:
            params[chr(tok[0])] = tok[1:].decode()
    w, h = int(params["W"]), int(params["H"])
    colorspace = params.get("C", "420")
    if colorspace != "444":
        raise NotImplementedError(
            f"y4m colorspace C{colorspace}: only C444 (full-res planes)"
        )
    plane = w * h
    pos = nl + 1
    frames = []
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("malformed FRAME header")
        pos = fnl + 1
        if pos + 3 * plane > len(data):
            raise ValueError("truncated frame payload")
        ycc = np.stack(
            [
                np.frombuffer(
                    data[pos + c * plane : pos + (c + 1) * plane], dtype=np.uint8
                ).reshape(h, w)
                for c in range(3)
            ],
            axis=-1,
        )
        frames.append(_ycc_to_rgb(ycc))
        pos += 3 * plane
    return np.stack(frames) if frames else np.empty((0, h, w, 3), np.uint8), {
        "w": w,
        "h": h,
        "fps": params.get("F", "25:1"),
        "n_frames": len(frames),
    }
