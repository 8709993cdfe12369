"""Baseline-DCT JPEG codec (grayscale, sequential, Huffman) — pure
numpy/stdlib, no imaging library.

This is the compressed-TRANSFORM-domain image path beside BMP (raw) and
PNG (lossless-compressed): JFIF container parse, DQT/DHT table decode,
Huffman entropy decode with DC prediction and byte-unstuffing, dequantize,
inverse zigzag, 8x8 IDCT, level shift. Everything follows the public
ITU-T T.81 (JPEG) specification; the quantization and Huffman tables are
the spec's own Annex K example tables. Reference analogue: none (the
reference pipeline is media-free) — this is the §2.13 multimodal
extension tier.

Exactness contract used by the registered query's oracle: an image whose
pixels are CONSTANT within each 8x8 block, with values at even offsets
from 128, survives encode→decode bit-exactly — the block DCT has only a
DC coefficient 8·(v−128), the Annex-K DC quantizer step is 16 so
quantization divides exactly (no rounding), and the IDCT of a DC-only
block is constant. So mean intensity is closed-form replayable in SQL
while the full container/Huffman/scan machinery still runs for real.
The AC path (runs, magnitudes, ZRL, EOB) is exercised by property tests
against the quantization-theoretic error bound.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Annex K.1 — example luminance quantization table (zigzag NOT
# applied; row-major 8x8).
QTABLE = np.array(
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
    dtype=np.int32,
)

# zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient —
# odd anti-diagonals run down-left (increasing row), even ones up-right
_zz = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
)
ZIGZAG = np.array(_zz, dtype=np.int64)

# Annex K.3 — typical Huffman tables for luminance DC / AC.
# BITS[i] = number of codes of length i+1; VALS = symbols in code order.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix D: F = D B D^T, B = D^T F D."""
    x = np.arange(8)
    u = x[:, None]
    d = 0.5 * np.cos((2 * x[None, :] + 1) * u * np.pi / 16.0)
    d[0] /= np.sqrt(2.0)
    return d


_D = _dct_matrix()


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, extra bits) for a DC diff / AC value per T.81 F.1.2."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


# Annex K.1 chrominance quantization and K.3 chrominance Huffman tables —
# used by the 3-component color path; the grayscale path stays on the
# luminance tables only.
CQTABLE = np.array(
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
    dtype=np.int32,
)

DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_C_VALS = list(range(12))
AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _encode_block(bw_writer, block, qtab, dc_codes, ac_codes, pred: int) -> int:
    """DCT + quantize + Huffman one 8x8 level-shifted block; returns the
    new DC predictor."""
    zz_r, zz_c = ZIGZAG[:, 0], ZIGZAG[:, 1]
    coef = _D @ block @ _D.T
    q = np.round(coef / qtab).astype(np.int64)
    zig = q[zz_r, zz_c]
    diff = int(zig[0]) - pred
    pred = int(zig[0])
    s, bits = _magnitude(diff)
    code, ln = dc_codes[s]
    bw_writer.put(code, ln)
    if s:
        bw_writer.put(bits, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zig)[0])) if np.any(zig[1:]) else 0
    for k in range(1, 64):
        v = int(zig[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw_writer.put(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        bw_writer.put(code, ln)
        bw_writer.put(bits, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw_writer.put(code, ln)
    return pred


def rgb_to_ycbcr(rgb):
    """JFIF full-range RGB -> YCbCr, rounded/clipped to uint8."""
    rgb = np.asarray(rgb, dtype=np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(np.round(np.stack([y, cb, cr], -1)), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(ycc):
    """JFIF full-range YCbCr -> RGB, rounded/clipped to uint8."""
    ycc = np.asarray(ycc, dtype=np.float64)
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2] - 0.0
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], -1)), 0, 255).astype(np.uint8)


def encode_jpeg_color(rgb, from_ycbcr: bool = False) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a baseline sequential
    YCbCr 4:4:4 JFIF JPEG: luminance tables for Y, the Annex-K
    chrominance quant/Huffman tables for Cb/Cr, interleaved Y-Cb-Cr MCUs
    with per-component DC prediction. No subsampling (every component
    full resolution) — the simplest legal color layout, and the one a
    lossless-minded feature pipeline wants anyway.

    ``from_ycbcr=True`` treats the input as already-converted YCbCr
    planes (the oracle-corpus hook: lets a generator pick Y/Cb/Cr values
    whose DC coefficients divide the quantizer steps exactly, which no
    rounded RGB→YCbCr image could guarantee)."""
    ycc = np.asarray(rgb, dtype=np.uint8) if from_ycbcr else rgb_to_ycbcr(rgb)
    h, w = ycc.shape[0], ycc.shape[1]
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(
        ycc, ((0, bh * 8 - h), (0, bw * 8 - w), (0, 0)), mode="edge"
    )
    luma = (_build_codes(DC_BITS, DC_VALS), _build_codes(AC_BITS, AC_VALS))
    chroma = (_build_codes(DC_C_BITS, DC_C_VALS), _build_codes(AC_C_BITS, AC_C_VALS))
    comp_tabs = [(QTABLE, *luma), (CQTABLE, *chroma), (CQTABLE, *chroma)]
    bw_writer = _BitWriter()
    preds = [0, 0, 0]
    for by in range(bh):
        for bx in range(bw):
            for ci, (qt, dc_c, ac_c) in enumerate(comp_tabs):
                block = padded[
                    by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, ci
                ].astype(np.float64) - 128.0
                preds[ci] = _encode_block(bw_writer, block, qt, dc_c, ac_c, preds[ci])
    scan = bw_writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    zz_r, zz_c = ZIGZAG[:, 0], ZIGZAG[:, 1]
    out = b"\xff\xd8"
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + QTABLE[zz_r, zz_c].astype(np.uint8).tobytes())
    out += seg(0xFFDB, b"\x01" + CQTABLE[zz_r, zz_c].astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, h, w, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(0xFFC4, b"\x01" + bytes(DC_C_BITS) + bytes(DC_C_VALS))
    out += seg(0xFFC4, b"\x11" + bytes(AC_C_BITS) + bytes(AC_C_VALS))
    out += seg(0xFFDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    out += scan + b"\xff\xd9"
    return out


def encode_jpeg_gray8(arr) -> bytes:
    """Encode an (H, W) uint8 array as a baseline sequential grayscale JFIF
    JPEG with the Annex-K tables. Partial edge MCUs pad by edge
    replication (so per-block-constant inputs stay constant per block)."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(arr, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    zz_r, zz_c = ZIGZAG[:, 0], ZIGZAG[:, 1]
    bw_writer = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                np.float64
            ) - 128.0
            pred = _encode_block(bw_writer, block, QTABLE, dc_codes, ac_codes, pred)
    scan = bw_writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qzz = QTABLE[zz_r, zz_c].astype(np.uint8).tobytes()
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + qzz)  # DQT, table 0, 8-bit
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")  # SOF0
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))  # DHT DC 0
    out += seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))  # DHT AC 0
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += scan + b"\xff\xd9"  # EOI
    return out


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated scan")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError("unexpected marker in scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def bit(self) -> int:
        return self.bits(1)


def _decode_table(bits: list[int], vals: list[int]):
    """(code, length) -> symbol lookup dict for Huffman decode."""
    inv: dict[tuple[int, int], int] = {}
    for sym, (code, ln) in _build_codes(bits, vals).items():
        inv[(ln, code)] = sym
    return inv


def _read_symbol(br: _BitReader, table) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code")


def _extend(bits: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s raw bits back to a signed value."""
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def decode_jpeg(payload: bytes):
    """Decode a baseline sequential JPEG (1-component grayscale or
    3-component YCbCr 4:4:4 interleaved) to an (H, W) or (H, W, 3) uint8
    array (RGB for color). Tables come from the file's own DQT/DHT
    segments; raises ValueError on progressive/subsampled/unsupported
    streams so callers can fall back."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = None
    comp_tq: dict[int, int] = {}  # component id -> quant table
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = struct.unpack_from(">H", payload, pos)[0]
        if marker == 0xFFD9:
            break
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated segment")
        if marker == 0xFFDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body, np.uint8, 64, p + 1).astype(np.int32)
                q = np.zeros((8, 8), np.int32)
                q[ZIGZAG[:, 0], ZIGZAG[:, 1]] = zz
                qtables[tq] = q
                p += 65
        elif marker == 0xFFC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                htables[(tc, th)] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xFFC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc not in (1, 3):
                raise ValueError("only 8-bit 1- or 3-component baseline")
            for ci in range(nc):
                # body: prec(1) h(2) w(2) nc(1), then (cid, HV, Tq) triples
                cid, hv, tq = body[6 + 3 * ci], body[7 + 3 * ci], body[8 + 3 * ci]
                if hv != 0x11:
                    raise ValueError("subsampled component unsupported")
                comp_tq[cid] = tq
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xFFDA:
            ns = body[0]
            if ns != len(comp_tq) or ns not in (1, 3):
                raise ValueError("scan/frame component mismatch")
            specs = []  # (qtab, dc_tab, ac_tab) in scan order
            for ci in range(ns):
                cid = body[1 + 2 * ci]
                td, ta = body[2 + 2 * ci] >> 4, body[2 + 2 * ci] & 0x0F
                if cid not in comp_tq:
                    raise ValueError("scan references unknown component")
                specs.append(
                    (qtables[comp_tq[cid]], htables[(0, td)], htables[(1, ta)])
                )
            planes = _decode_scan(payload, pos + 2 + ln, h, w, specs)
            if ns == 1:
                return planes[..., 0]
            return ycbcr_to_rgb(planes)
        pos += 2 + ln
    raise ValueError("no SOS marker")


def decode_jpeg_gray8(payload: bytes):
    """Single-component entry point (the closed-form-oracle path): decode
    and require grayscale; raises ValueError for color streams."""
    out = decode_jpeg(payload)
    if out.ndim != 2:
        raise ValueError("not a grayscale JPEG")
    return out


def _decode_scan(payload, pos, h, w, specs):
    """Interleaved MCU scan decode: one 8x8 block per component per MCU
    (valid for 1 or 3 components at 1x1 sampling), per-component DC
    predictors. Returns float planes stacked (bh*8, bw*8, ns) cropped to
    (h, w, ns) after rounding."""
    if h is None or w is None:
        raise ValueError("SOS before SOF")
    bh, bw = -(-h // 8), -(-w // 8)
    ns = len(specs)
    br = _BitReader(payload, pos)
    out = np.zeros((bh * 8, bw * 8, ns), np.float64)
    zz_r, zz_c = ZIGZAG[:, 0], ZIGZAG[:, 1]
    preds = [0] * ns
    for by in range(bh):
        for bx in range(bw):
            for ci, (qtab, dc_tab, ac_tab) in enumerate(specs):
                zig = np.zeros(64, np.int64)
                s = _read_symbol(br, dc_tab)
                diff = _extend(br.bits(s), s) if s else 0
                preds[ci] += diff
                zig[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = _read_symbol(br, ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC index overrun")
                    zig[k] = _extend(br.bits(s), s)
                    k += 1
                coef = np.zeros((8, 8), np.float64)
                coef[zz_r, zz_c] = zig * qtab[zz_r, zz_c]
                block = _D.T @ coef @ _D + 128.0
                out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, ci] = block
    return np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)
