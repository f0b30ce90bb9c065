"""Pure-numpy image codecs for the uncompressed formats (BMP 24-bit,
binary PPM) plus nearest-neighbor resampling.

These are the real pixel kernels behind llmops.multimodal's decode /
resize steps: no codec libraries exist in this container, but the
uncompressed container formats are just headers + raster order, PNG's
compression is stdlib zlib + per-scanline prediction filters, and
baseline JPEG is an exact 8x8 DCT + Huffman coding implemented in
llmops/jpegcodec.py — so all four decodes are real. Only the exotic
JPEG variants (progressive, 12-bit, arithmetic) stay loud.

Everything here operates on a single payload (bytes ↔ uint8 ndarray
(height, width, 3) RGB); batch fan-out across the cluster is the
caller's mapInPandas contract.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_codec(b: bytes) -> str | None:
    """Magic-byte codec sniff (Display.Text style)."""
    if b[:2] == b"BM":
        return "bmp"
    if b[:2] == b"P6":
        return "ppm"
    if b[:2] == b"\xff\xd8":
        return "jpeg"
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return None


# ----------------------------------------------------------------- BMP

def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB → 24-bit uncompressed BMP (BI_RGB, bottom-up)."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError(f"expected (h, w, 3) RGB, got {arr.shape}")
    row_size = (w * 3 + 3) // 4 * 4
    image_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    rows = bytearray()
    bgr = arr[:, :, ::-1]  # BMP stores BGR
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up raster
        rows += bgr[y].tobytes() + pad
    return header + info + bytes(rows)


def decode_bmp(b: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → uint8 (h, w, 3) RGB. Handles bottom-up
    (positive height) and top-down (negative height) rasters."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload (bad magic)")
    (data_offset,) = struct.unpack_from("<I", b, 10)
    header_size, w, h_raw = struct.unpack_from("<Iii", b, 14)
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    (bpp,) = struct.unpack_from("<H", b, 28)
    (compression,) = struct.unpack_from("<I", b, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit BI_RGB supported, got bpp={bpp} compression={compression}"
        )
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    row_size = (w * 3 + 3) // 4 * 4
    raster = np.frombuffer(
        b, dtype=np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)
    bgr = raster[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])  # BGR → RGB


# ----------------------------------------------------------------- PPM

def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB → binary PPM (P6, maxval 255)."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError(f"expected (h, w, 3) RGB, got {arr.shape}")
    return f"P6\n{w} {h}\n255\n".encode("ascii") + arr.tobytes()


def decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6) → uint8 (h, w, 3) RGB. Tolerates comments and
    arbitrary whitespace in the header, per the netpbm spec."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM payload (bad magic)")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    return (
        np.frombuffer(b, dtype=np.uint8, count=h * w * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


# ----------------------------------------------------------------- PNG
#
# PNG's compression is stdlib zlib; the rest of the format is chunk
# framing + per-scanline prediction filters (png.org spec, public).
# Supported: 8-bit greyscale(0)/RGB(2)/RGBA(6), non-interlaced — the
# overwhelming real-world cases. Paletted/16-bit/interlaced stay loud.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(b: bytes) -> np.ndarray:
    """PNG → uint8 (h, w, 3) RGB (alpha dropped, grey broadcast)."""
    import zlib

    if b[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = []
    while pos < len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color not in (0, 2, 6):
                raise NotImplementedError(
                    f"PNG variant unsupported (depth={depth} color={color} "
                    f"interlace={interlace}): only 8-bit grey/RGB/RGBA, "
                    "non-interlaced"
                )
            nch = {0: 1, 2: 3, 6: 4}[color]
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    assert len(raw) == h * (stride + 1), "PNG raster size mismatch"
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        ftype = raw[y * (stride + 1)]
        if ftype == 1:  # Sub — sequential in x, vectorize per channel lag
            for x in range(nch, stride):
                row[x] = (int(row[x]) + int(row[x - nch])) & 0xFF
        elif ftype == 2:  # Up
            row = (row.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - nch]) if x >= nch else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(row[x - nch]) if x >= nch else 0
                ul = int(prev[x - nch]) if x >= nch else 0
                row[x] = (
                    int(row[x]) + _paeth(left, int(prev[x]), ul)
                ) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = row
        prev = row
    px = out.reshape(h, w, nch)
    if nch == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3].copy()


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB → PNG (filter 0 rows, one zlib stream)."""
    import zlib

    arr = np.asarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    raster = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raster, 6))
        + chunk(b"IEND", b"")
    )


def _decode_jpeg(b: bytes) -> np.ndarray:
    from hadoop_source_spark.llmops.jpegcodec import decode_jpeg

    return decode_jpeg(b)


DECODERS = {
    "bmp": decode_bmp,
    "ppm": decode_ppm,
    "png": decode_png,
    "jpeg": _decode_jpeg,
}


def _encode_jpeg(arr: np.ndarray) -> bytes:
    from hadoop_source_spark.llmops.jpegcodec import encode_jpeg

    # 4:4:4 for re-encoding: thumbnails are small, so chroma decimation
    # would dominate the error while saving almost nothing
    return encode_jpeg(arr, quality=85, subsampling="4:4:4")


ENCODERS = {
    "bmp": encode_bmp,
    "ppm": encode_ppm,
    "png": encode_png,
    "jpeg": _encode_jpeg,
}


def decode_any(b: bytes) -> tuple[str, np.ndarray]:
    """Sniff + decode a payload; (codec, pixels)."""
    codec = sniff_codec(b)
    if codec in DECODERS:
        return codec, DECODERS[codec](b)
    raise ValueError("unknown image payload (no BMP/PPM/JPEG/PNG magic)")


# -------------------------------------------------------------- resample

def nn_resize(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width, 3) — pure index
    arithmetic, the classic thumbnail kernel."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs]
