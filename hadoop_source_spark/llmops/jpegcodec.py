"""Pure-numpy baseline JPEG codec (ITU-T T.81, public spec).

Closes the last stubbed image codec in llmops.multimodal: baseline
sequential DCT, 8-bit precision, greyscale / YCbCr 4:4:4 / 4:2:0 —
the overwhelming majority of real-world JPEG files. Progressive,
arithmetic-coded, 12-bit, and hierarchical variants stay loud
NotImplementedError (same policy as imagecodec.decode_png's
exotic-variant gate).

Design notes:
- The DCT is an exact 8x8 DCT-II/III matrix product (no fast-DCT
  approximation), so encode→decode error is quantization only.
- Entropy coding is bitwise Python over small per-image buffers; the
  cluster-scale fan-out is the caller's mapInPandas contract
  (multimodal.decode_image), where each task decodes its own files —
  same shape as functions/avro_lite.py's per-file decode.
- The encoder emits the Annex K quantization tables (IJG quality
  scaling) and standard Annex K Huffman tables in DHT segments; the
  decoder trusts only the DHT/DQT it parses from the stream, so
  round-trip correctness never depends on table constants matching an
  external library.

Reference parity note: the reference engine has no image codecs at
all — this belongs to the beyond-reference LLM-pipeline surface
(multimodal ingestion), like imagecodec/audiocodec.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan order: index i of the scan -> position in the 8x8 block
# (row-major). T.81 Figure A.6.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 quantization tables (quality 50 base).
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Annex K.3 standard Huffman tables: (bits[1..16] code-length counts,
# symbol values in canonical order).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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

# Exact orthonormal 8-point DCT-II matrix: A @ x applies the DCT along
# an axis; A.T inverts it.
_N = 8
_A = np.zeros((_N, _N))
for _k in range(_N):
    _c = np.sqrt(1.0 / _N) if _k == 0 else np.sqrt(2.0 / _N)
    _A[_k] = _c * np.cos((2 * np.arange(_N) + 1) * _k * np.pi / (2 * _N))


def _dct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _A.T @ coef @ _A


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 = Annex K verbatim; 1 coarsest, 100 lossless-ish."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 Annex C canonical code assignment: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC amplitude coding: value -> (ssss category, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


class _BitReader:
    """Entropy-segment bit reader honoring 0xFF00 stuffing; stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                raise _RestartMarker()
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Consume an RSTn marker and realign to a byte boundary."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    pass


def _extend(v: int, s: int) -> int:
    """T.81 F.12 EXTEND: map s appended bits back to a signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _HuffDecoder:
    """Canonical-code decoder: walk min-code/max-code per length (F.16)."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        idx = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = idx
                self.mincode[length] = code
                code += bits[length - 1]
                idx += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, r: _BitReader) -> int:
        code = r.bit()
        length = 1
        while code > self.maxcode[length]:
            code = (code << 1) | r.bit()
            length += 1
            if length > 16:
                raise ValueError("invalid Huffman code in scan")
        return self.vals[self.valptr[length] + code - self.mincode[length]]


# ----------------------------------------------------------------- encode

def _encode_blocks(
    plane: np.ndarray, qtab: np.ndarray
) -> list[np.ndarray]:
    """8x8-tile a (padded) plane, DCT + quantize, return zigzag vectors."""
    h, w = plane.shape
    shifted = plane.astype(np.float64) - 128.0
    q = qtab.reshape(8, 8).astype(np.float64)
    out = []
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            coef = _dct2(shifted[by : by + 8, bx : bx + 8])
            quant = np.round(coef / q).astype(np.int32)
            out.append(quant.reshape(64)[ZIGZAG])
    return out


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (h + mult - 1) // mult * mult
    pw = (w + mult - 1) // mult * mult
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _emit_block(
    bw: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    dc = int(zz[0])
    s, amp = _magnitude(dc - pred)
    code, length = dc_codes[s]
    bw.put(code, length)
    if s:
        bw.put(amp, s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.put(code, length)
            run -= 16
        s, amp = _magnitude(v)
        code, length = ac_codes[(run << 4) | s]
        bw.put(code, length)
        bw.put(amp, s)
        run = 0
    if last_nz != 63:
        code, length = ac_codes[0x00]  # EOB
        bw.put(code, length)
    return dc


def _dht_segment(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def _dqt_segment(tid: int, table_zz: np.ndarray) -> bytes:
    payload = bytes([tid]) + bytes(int(x) for x in table_zz)
    return b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload


def rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def encode_jpeg(
    arr: np.ndarray, quality: int = 85, subsampling: str = "4:2:0"
) -> bytes:
    """uint8 (h, w, 3) RGB → baseline JFIF JPEG.

    subsampling: "4:4:4" (full chroma) or "4:2:0" (2x2 chroma
    decimation, the common camera/web default).
    """
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB, got {arr.shape}")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"subsampling must be 4:4:4 or 4:2:0, got {subsampling}")
    h, w = arr.shape[:2]
    ycc = rgb_to_ycbcr(arr)
    qy = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    sub = subsampling == "4:2:0"
    ymult = 16 if sub else 8
    yp = _pad_edge(ycc[..., 0], ymult)
    if sub:
        # 2x2 mean decimation on the padded luma grid
        cbp = _pad_edge(ycc[..., 1], 16)
        crp = _pad_edge(ycc[..., 2], 16)
        cbp = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        crp = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        cbp = _pad_edge(ycc[..., 1], 8)
        crp = _pad_edge(ycc[..., 2], 8)

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    qyz = qy  # tables are stored/applied in zigzag order in DQT
    qcz = qc
    qy_block = qy[UNZIGZAG]  # natural-order table for the DCT divide
    qc_block = qc[UNZIGZAG]

    bw = _BitWriter()
    pred = [0, 0, 0]
    mcu_rows = yp.shape[0] // ymult
    mcu_cols = yp.shape[1] // ymult
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if sub:
                y0, x0 = my * 16, mx * 16
                for sy in range(2):
                    for sx in range(2):
                        tile = yp[
                            y0 + sy * 8 : y0 + sy * 8 + 8,
                            x0 + sx * 8 : x0 + sx * 8 + 8,
                        ]
                        zz = _quant_zz(tile, qy_block)
                        pred[0] = _emit_block(bw, zz, pred[0], dc_l, ac_l)
                cy, cx = my * 8, mx * 8
                for plane, idx in ((cbp, 1), (crp, 2)):
                    tile = plane[cy : cy + 8, cx : cx + 8]
                    zz = _quant_zz(tile, qc_block)
                    pred[idx] = _emit_block(bw, zz, pred[idx], dc_c, ac_c)
            else:
                y0, x0 = my * 8, mx * 8
                for plane, idx, qb, dct, act in (
                    (yp, 0, qy_block, dc_l, ac_l),
                    (cbp, 1, qc_block, dc_c, ac_c),
                    (crp, 2, qc_block, dc_c, ac_c),
                ):
                    tile = plane[y0 : y0 + 8, x0 : x0 + 8]
                    zz = _quant_zz(tile, qb)
                    pred[idx] = _emit_block(bw, zz, pred[idx], dct, act)
    scan = bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += _dqt_segment(0, qyz)
    out += _dqt_segment(1, qcz)
    # SOF0: 8-bit precision, 3 components
    hv_y = 0x22 if sub else 0x11
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, hv_y, 0])  # Y: id 1, sampling, qtable 0
    sof += bytes([2, 0x11, 1])  # Cb
    sof += bytes([3, 0x11, 1])  # Cr
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _quant_zz(tile: np.ndarray, qtab_block: np.ndarray) -> np.ndarray:
    coef = _dct2(tile.astype(np.float64) - 128.0)
    quant = np.round(coef / qtab_block.reshape(8, 8)).astype(np.int32)
    return quant.reshape(64)[ZIGZAG]


# ----------------------------------------------------------------- decode

def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 (h, w, 3) RGB.

    Supports: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
    sampling factors 1x1/2x1/1x2/2x2 on the first component (others must
    be 1x1), restart markers. Progressive (SOF2) and other variants
    raise NotImplementedError; truncated/corrupt streams ValueError.
    """
    try:
        return _decode_jpeg(b)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"truncated or corrupt JPEG: {exc}") from exc


def _decode_jpeg(b: bytes) -> np.ndarray:
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (bad SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    while pos < len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", b, pos + 2)
        seg = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                qtabs[tq] = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=off + 1
                ).astype(np.int32)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                dec = _HuffDecoder(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = dec
                off += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline(+ext seq)
            precision, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + i * 3 : 9 + i * 3]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tables = seg[1 + i * 2], seg[2 + i * 2]
                scan_comps.append((cs, tables >> 4, tables & 0x0F))
            data_pos = pos + 2 + seglen
            return _decode_scan(
                b, data_pos, frame, scan_comps, qtabs, dc_tabs, ac_tabs,
                restart_interval,
            )
        pos += 2 + seglen
    raise ValueError("JPEG stream ended without a scan")


def _decode_scan(
    b: bytes,
    pos: int,
    frame,
    scan_comps,
    qtabs,
    dc_tabs,
    ac_tabs,
    restart_interval: int,
) -> np.ndarray:
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if any((c[1], c[2]) != (1, 1) for c in comps[1:]):
        raise NotImplementedError("subsampling on non-first component unsupported")
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise NotImplementedError(f"sampling {hmax}x{vmax} unsupported")
    mcu_w = 8 * hmax
    mcu_h = 8 * vmax
    mcu_cols = (fw + mcu_w - 1) // mcu_w
    mcu_rows = (fh + mcu_h - 1) // mcu_h

    planes = []
    for cid, ch, cv, tq in comps:
        pw = mcu_cols * ch * 8
        ph = mcu_rows * cv * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    by_id = {c[0]: i for i, c in enumerate(comps)}
    order = []  # (comp_index, block dy, dx) in interleaved MCU order
    for cs, _td, _ta in scan_comps:
        i = by_id[cs]
        _cid, ch, cv, _tq = comps[i]
        for dy in range(cv):
            for dx in range(ch):
                order.append((i, dy, dx))
    tabs = {by_id[cs]: (dc_tabs[td], ac_tabs[ta]) for cs, td, ta in scan_comps}

    reader = _BitReader(b, pos)
    pred = [0] * len(comps)
    n_mcu = 0
    qblocks = {i: qtabs[c[3]][UNZIGZAG].reshape(8, 8) for i, c in enumerate(comps)}
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.sync_restart()
                pred = [0] * len(comps)
            n_mcu += 1
            for i, dy, dx in order:
                dc_dec, ac_dec = tabs[i]
                try:
                    zz = _decode_block(reader, dc_dec, ac_dec)
                except _RestartMarker:
                    # tolerate encoders that emit RST slightly early
                    reader.sync_restart()
                    pred = [0] * len(comps)
                    zz = _decode_block(reader, dc_dec, ac_dec)
                pred[i] += int(zz[0])
                zz[0] = pred[i]
                coef = zz[UNZIGZAG].reshape(8, 8).astype(np.float64) * qblocks[i]
                tile = _idct2(coef) + 128.0
                _cid, ch, cv, _tq = comps[i]
                y0 = (my * cv + dy) * 8
                x0 = (mx * ch + dx) * 8
                planes[i][y0 : y0 + 8, x0 : x0 + 8] = tile

    if len(comps) == 1:
        y = np.clip(planes[0][:fh, :fw].round(), 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=2)

    y = planes[0][:fh, :fw]
    out_c = []
    for i in (1, 2):
        _cid, ch, cv, _tq = comps[i]
        p = planes[i]
        if hmax // max(ch, 1) == 2:
            p = np.repeat(p, 2, axis=1)
        if vmax // max(cv, 1) == 2:
            p = np.repeat(p, 2, axis=0)
        out_c.append(p[:fh, :fw])
    return ycbcr_to_rgb(y, out_c[0], out_c[1])


def _decode_block(r: _BitReader, dc_dec: _HuffDecoder, ac_dec: _HuffDecoder) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int64)
    s = dc_dec.decode(r)
    diff = _extend(r.bits(s), s) if s else 0
    zz[0] = diff
    k = 1
    while k < 64:
        rs = ac_dec.decode(r)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run overflows block")
        zz[k] = _extend(r.bits(size), size)
        k += 1
    return zz
