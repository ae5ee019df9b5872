"""Minimal pure-numpy baseline JPEG (JFIF) codec.

The sandbox has no PIL/libjpeg, so the image pipeline gets a real,
spec-conformant baseline codec instead of a stub: encoded files are
valid JPEGs (SOI/DQT/SOF0/DHT/SOS/EOI, standard Annex-K quantization
tables scaled libjpeg-style by quality, canonical Huffman tables
declared in DHT, 0xFF byte stuffing), and the decoder reads any
baseline-sequential JPEG with 8-bit samples and sampling factors 1 or 2
(4:4:4 / 4:2:2 / 4:2:0), building its Huffman tables from the file's
own DHT segments.

Deliberate simplifications (all honest failure gates, not silent
corruption):
- encode uses fixed-length canonical Huffman tables (12 DC symbols at 4
  bits, 162 AC symbols at 8 bits) — valid JPEG, ~2x bigger files than
  optimal tables; compression ratio is not this sandbox's goal.
- encode is 4:4:4 (no chroma subsampling) so the PSNR>=40dB invariant
  is controlled by quality alone.
- progressive/arithmetic/12-bit/DRI-restart streams raise
  NotImplementedError.

DCT/quantization/zigzag are vectorized numpy over all blocks at once;
only the entropy coding walks blocks in Python (bounded by symbols, not
pixels; decode uses a 16-bit lookahead table, one array access per
symbol).

Reference parity note: the reference engine handles images by reference
only (model/ImgDataType.java:14-21 extracts the src basename); real
decode is a graft requirement from the driver's input_hint (PSNR>=40dB
for lossy formats).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

_QY = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
_QC = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def _zigzag() -> np.ndarray:
    """(64,) flat indices (row*8+col) in JPEG zigzag scan order."""
    out = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            diag.reverse()
        out.extend(diag)
    return np.array([r * 8 + c for r, c in out], dtype=np.int64)


_ZZ = _zigzag()
_UNZZ = np.argsort(_ZZ)


def _dct_matrix() -> np.ndarray:
    u, x = np.mgrid[0:8, 0:8]
    c = np.where(u == 0, 1 / np.sqrt(2), 1.0)
    return 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)


_DCT = _dct_matrix()

# encoder Huffman: fixed-length canonical tables (see module docstring).
# BITS[i] = number of codes of length i+1; HUFFVAL = symbols in code order.
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_AC_SYMBOLS = [
    r * 16 + s for r in range(16) for s in range(1, 11)
] + [0x00, 0xF0]  # (run,size) for size 1..10, plus EOB and ZRL
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = sorted(_AC_SYMBOLS)


def _canonical_codes(bits: list, vals: list) -> dict:
    """JPEG canonical Huffman assignment: symbol -> (code, length)."""
    out, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_ENC_DC = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
_ENC_AC = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)


# ---------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s per spec
        return bytes(self.buf)


def _rgb_to_ycc(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return np.stack([y, cb, cr], axis=-1)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (n_blocks, 8, 8) in row-major block order; edge pad."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    return (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8),
        bh,
        bw,
    )


def _size_bits(v: int) -> int:
    return int(v).bit_length() if v else 0


def encode_jpeg(pixels: np.ndarray, quality: int = 92) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    qy, qc = _scaled_q(_QY, quality), _scaled_q(_QC, quality)
    ycc = _rgb_to_ycc(pixels)

    comp_quant = []  # per component: (n_blocks, 64) zigzagged ints
    for ci in range(3):
        blocks, _, _ = _to_blocks(ycc[..., ci] - 128.0)
        coef = np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT)
        q = qy if ci == 0 else qc
        quant = np.round(coef / q).astype(np.int64)
        comp_quant.append(quant.reshape(-1, 64)[:, _ZZ])

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    n_blocks = comp_quant[0].shape[0]
    for bi in range(n_blocks):  # 4:4:4 => MCU = one block per component
        for ci in range(3):
            zz = comp_quant[ci][bi]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            sz = _size_bits(abs(diff))
            code, length = _ENC_DC[sz]
            bw.write(code, length)
            if sz:
                bw.write(diff if diff > 0 else diff + (1 << sz) - 1, sz)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = _ENC_AC[0xF0]
                    bw.write(c, ln)
                    run -= 16
                sz = _size_bits(abs(v))
                c, ln = _ENC_AC[run * 16 + sz]
                bw.write(c, ln)
                bw.write(v if v > 0 else v + (1 << sz) - 1, sz)
                run = 0
            if last < 63:
                c, ln = _ENC_AC[0x00]
                bw.write(c, ln)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(tc: int, th: int, bits: list, vals: list) -> bytes:
        return seg(
            0xFFC4, bytes([tc * 16 + th]) + bytes(bits) + bytes(vals)
        )

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qy.astype(np.uint8).ravel()[_ZZ]))
    out += seg(0xFFDB, b"\x01" + bytes(qc.astype(np.uint8).ravel()[_ZZ]))
    # SOF0: 8-bit, 3 components, all sampling 1x1, Y->q0, Cb/Cr->q1
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])
    out += seg(0xFFC0, sof)
    out += dht(0, 0, _ENC_DC_BITS, _ENC_DC_VALS)
    out += dht(1, 0, _ENC_AC_BITS, _ENC_AC_VALS)
    # SOS: Y uses table 0, chroma also table 0 (same tables emitted once)
    sos = bytes([3]) + b"".join(
        bytes([cid, 0x00]) for cid in (1, 2, 3)
    ) + bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return out


# ---------------------------------------------------------------- decode


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            byte = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = ((self.acc << 8) | byte) & 0xFFFFFFFFFF
            self.nbits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self._fill(n)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v


def _lookup_table(bits: list, vals: list) -> tuple:
    """16-bit-lookahead decode tables: value and code-length arrays."""
    sym = np.zeros(1 << 16, dtype=np.int32) - 1
    ln = np.zeros(1 << 16, dtype=np.int8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


def _extend(v: int, sz: int) -> int:
    return v if v >= (1 << (sz - 1)) else v - (1 << sz) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB (grayscale expands)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple, tuple] = {}
    comps: list[dict] = []
    h = w = 0
    entropy = None
    scan_comps: list[tuple] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0xD9):
            continue
        (length,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + length]
        pos += length
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(
                    payload[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.float64)
                qt[tq] = tbl[_UNZZ].reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 15
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                huff[(tc, th)] = _lookup_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit samples")
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                hi, vi = hv >> 4, hv & 15
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError("sampling factors beyond 2")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = payload[0]
            for i in range(ns):
                cid, tables = payload[1 + 2 * i : 3 + 2 * i]
                scan_comps.append((cid, tables >> 4, tables & 15))
            # entropy segment: strip stuffed 0xFF00, stop at next marker
            raw = bytearray()
            p = pos
            while p < len(data):
                b = data[p]
                if b == 0xFF:
                    nxt = data[p + 1] if p + 1 < len(data) else 0xD9
                    if nxt == 0x00:
                        raw.append(0xFF)
                        p += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        raise NotImplementedError("restart markers")
                    break
                raw.append(b)
                p += 1
            entropy = bytes(raw)
            pos = p
            break
    if entropy is None or not comps:
        raise ValueError("missing SOS/SOF")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []
    for cid, td, ta in scan_comps:
        c = by_id[cid]
        c["td"], c["ta"] = td, ta
        order.append(c)
        c["coef"] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )

    br = _BitReader(entropy)
    prev_dc = {c["id"]: 0 for c in comps}

    def read_sym(tc: int, th: int) -> int:
        sym, ln = huff[(tc, th)]
        look = br.peek16()
        s = int(sym[look])
        if s < 0:
            raise ValueError("invalid Huffman code")
        br.skip(int(ln[look]))
        return s

    for my in range(mcuy):
        for mx in range(mcux):
            for c in order:
                for byi in range(c["v"]):
                    for bxi in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        sz = read_sym(0, c["td"])
                        diff = _extend(br.read(sz), sz) if sz else 0
                        prev_dc[c["id"]] += diff
                        zz[0] = prev_dc[c["id"]]
                        k = 1
                        while k < 64:
                            rs = read_sym(1, c["ta"])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read(s), s)
                            k += 1
                        block = (zz[_UNZZ].reshape(8, 8)) * qt[c["tq"]]
                        px = _DCT.T @ block @ _DCT
                        y0 = (my * c["v"] + byi) * 8
                        x0 = (mx * c["h"] + bxi) * 8
                        c["coef"][y0 : y0 + 8, x0 : x0 + 8] = px

    planes = []
    for c in comps:
        plane = c["coef"] + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
