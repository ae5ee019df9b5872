"""Minimal pure-numpy PNG codec + perceptual hash.

The sandbox has no PIL/opencv, so the image payload pipeline uses this
codec: encode is deterministic (zlib level 6, filter 0), decode is exact
(PNG is lossless → the decoded-pixel allclose invariant is exact; PSNR is
infinite). The lossy counterpart is the baseline JPEG codec in
functions/jpeg.py; the Spark-side plumbing (schema, batching, UDF
signatures) is identical for both formats.

Only 8-bit RGB (colour type 2), filter 0 — all this engine emits.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8. Supports what encode_png emits."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if (depth, ctype) != (8, 2):
                raise NotImplementedError("only 8-bit RGB")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("missing IHDR")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    if (raw[:, 0] != 0).any():
        raise NotImplementedError("only filter 0")
    return raw[:, 1:].reshape(h, w, 3).copy()


def _iter_chunks(data: bytes):
    # Strict framing, matching decode_warc/decode_png conventions: a
    # declared chunk length that overruns the buffer, or a stream that
    # ends without IEND, is a truncated/corrupt file and must raise —
    # silently yielding a partial chunk list would make metadata_audit
    # under-report on damaged payloads.
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    saw_iend = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG: partial chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError(
                f"truncated PNG: chunk {tag!r} declares {length} bytes "
                "past end of buffer"
            )
        yield tag, data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IEND":
            saw_iend = True
            break
    if not saw_iend:
        raise ValueError("corrupt PNG: stream ended without IEND")


def text_chunks(data: bytes) -> list[tuple[str, str]]:
    """Parse every tEXt chunk (RFC 2083 §4.2.3: latin-1
    keyword\\0value) from a PNG, in file order."""
    out = []
    for tag, payload in _iter_chunks(data):
        if tag == b"tEXt":
            key, _, val = payload.partition(b"\x00")
            out.append((key.decode("latin-1"), val.decode("latin-1")))
    return out


def add_text_chunks(data: bytes, items: list[tuple[str, str]]) -> bytes:
    """Insert tEXt chunks right after IHDR (valid placement per the
    spec; decoders skip ancillary chunks they don't know)."""
    ihdr_end = 8 + 12 + 13  # signature + IHDR chunk (13-byte payload)
    text = b"".join(
        _chunk(
            b"tEXt", k.encode("latin-1") + b"\x00" + v.encode("latin-1")
        )
        for k, v in items
    )
    return data[:ihdr_end] + text + data[ihdr_end:]


def strip_ancillary(data: bytes) -> bytes:
    """Re-emit the PNG keeping only critical chunks (IHDR/IDAT/IEND) —
    the metadata-strip pass; pixels are untouched by construction."""
    out = [_SIG]
    for tag, payload in _iter_chunks(data):
        if tag in (b"IHDR", b"IDAT", b"IEND"):
            out.append(_chunk(tag, payload))
    return b"".join(out)


def perceptual_hash(pixels: np.ndarray, grid: int = 8) -> int:
    """Average-hash: downsample luma to grid², threshold at mean → int64.

    Deterministic, numpy-only; near-duplicate images (small noise) map to
    nearby hashes (hamming distance), which is what the phash-based
    image-dedup operator groups on.
    """
    luma = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = luma.shape
    ys = (np.arange(grid) * h // grid).astype(int)
    xs = (np.arange(grid) * w // grid).astype(int)
    ye = np.append(ys[1:], h)
    xe = np.append(xs[1:], w)
    cells = np.empty((grid, grid))
    for i in range(grid):
        for j in range(grid):
            cells[i, j] = luma[ys[i] : ye[i], xs[j] : xe[j]].mean()
    bits = (cells > cells.mean()).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val  # to signed int64


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical arrays)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * np.log10(255.0) - 10 * np.log10(mse)
