"""Header-only image metadata sniffing.

At 100 TB you do not decode pixels to learn an image's dimensions: PNG
carries them in the fixed-offset IHDR chunk (first 24 bytes) and JPEG in
the first SOF segment (within the first few hundred bytes). These
parsers touch only those header bytes — O(header), not O(pixels) — so a
dims/aspect scan of a petabyte image corpus is IO-bound on parquet
column reads, never CPU-bound on codecs. Formats match this repo's
pure-numpy codecs (functions/png.py, functions/jpeg.py) and any
spec-conforming external encoder.
"""

from __future__ import annotations

import struct

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# SOF markers carrying frame dims: C0-CF minus DHT (C4), JPG (C8),
# DAC (CC) — ITU T.81 table B.1
_SOF_MARKERS = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


def sniff_jpeg_dqt(data: bytes) -> dict[int, list[int]] | None:
    """8-bit quantization tables from a JPEG's DQT segments, keyed by
    table id, entries in file (zigzag) order — header bytes only, no
    entropy decode. None if the payload isn't a JPEG or carries 16-bit
    tables. The DQT is the encoder's fingerprint: matching it against a
    known scaling law recovers the encode quality setting (the standard
    corpus-forensics trick for 'was this image re-compressed low?')."""
    if data[:2] != b"\xff\xd8":
        return None
    tables: dict[int, list[int]] = {}
    i, n = 2, len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if marker == 0xDB:
            j, end = i + 4, i + 2 + seg_len
            while j < end:
                prec, tid = data[j] >> 4, data[j] & 0x0F
                if prec != 0:
                    return None  # 16-bit tables: not this codec family
                tables[tid] = list(data[j + 1 : j + 65])
                j += 65
        if marker == 0xDA:  # entropy-coded data follows; DQTs precede
            break
        i += 2 + seg_len
    return tables or None


def sniff_dims(data: bytes) -> tuple[str, int, int] | None:
    """(fmt, width, height) from the container header alone, or None if
    the payload is neither a PNG nor a JPEG."""
    if data[:8] == PNG_SIG:
        if len(data) < 24 or data[12:16] != b"IHDR":
            return None
        w, h = struct.unpack(">II", data[16:24])
        return ("png", w, h)
    if data[:2] == b"\xff\xd8":
        i = 2
        n = len(data)
        while i + 4 <= n:
            if data[i] != 0xFF:
                return None
            marker = data[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # standalone
                i += 2
                continue
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if marker in _SOF_MARKERS:
                if i + 9 > n:
                    return None
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return ("jpeg", w, h)
            if marker == 0xDA:  # SOS: entropy-coded data, no SOF seen
                return None
            i += 2 + seg_len
        return None
    return None
