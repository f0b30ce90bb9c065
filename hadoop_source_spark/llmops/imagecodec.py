"""Pure-numpy image codecs for the uncompressed formats (BMP 24-bit,
binary PPM) plus nearest-neighbor resampling.

These are the real pixel kernels behind llmops.multimodal's decode /
resize steps: no codec libraries exist in this container, but the
uncompressed container formats are just headers + raster order, so the
decode is exact. Compressed codecs (JPEG/PNG) remain stubbed in
multimodal.decode_image — sniffed by magic and reported loudly.

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


DECODERS = {"bmp": decode_bmp, "ppm": decode_ppm}


def decode_any(b: bytes) -> tuple[str, np.ndarray]:
    """Sniff + decode an uncompressed payload; (codec, pixels)."""
    codec = sniff_codec(b)
    if codec in DECODERS:
        return codec, DECODERS[codec](b)
    if codec in ("jpeg", "png"):
        raise NotImplementedError(
            f"{codec} decode requires a codec library not in this container"
        )
    raise ValueError("unknown image payload (no BMP/PPM/JPEG/PNG magic)")


# -------------------------------------------------------------- resample

def nn_resize(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width, 3) — pure index
    arithmetic, the classic thumbnail kernel."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs]
