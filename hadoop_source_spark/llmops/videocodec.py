"""Pure-python MJPEG/AVI video container codec (RIFF framing per the
public AVI spec; frames are baseline JPEGs handled by jpegcodec).

Upgrades llmops.multimodal.sample_frames from byte-window stand-ins to
REAL video frame sampling for the one codec stack this container can
decode end-to-end: AVI(RIFF) parsing here, JPEG pixels via
llmops/jpegcodec.py. Other containers/codecs (MP4/H.264 etc.) remain
loud NotImplementedError — the sniff identifies them.

Like the image codecs, everything operates on one payload; cluster
fan-out is the caller's mapInPandas contract.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_video(b: bytes) -> str | None:
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return "avi"
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return "mp4"
    if b[:4] == b"\x1a\x45\xdf\xa3":
        return "mkv"
    return None


def encode_mjpeg_avi(
    frames: list[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """List of uint8 (h, w, 3) RGB frames → MJPEG-in-AVI bytes."""
    from hadoop_source_spark.llmops.jpegcodec import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality, subsampling="4:2:0") for f in frames]

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        0, 0,
        0x10,  # AVIF_HASINDEX off; 0x10 = AVIF_WASCAPTUREFILE-ish, benign
        len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        # flags, priority, language, then initial/scale/rate/start/
        # length/suggested-buffer/quality/sample-size
        + struct.pack("<IHH8I", 0, 0, 0, 0, 1, fps, 0, len(frames),
                      0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(b: bytes) -> tuple[dict, list[bytes]]:
    """AVI bytes → ({width, height, n_frames, us_per_frame}, [frame jpeg
    bytes]). Walks the RIFF chunk tree; only the MJPG codec is accepted
    (other FOURCCs raise NotImplementedError — we can't decode their
    frames)."""
    if sniff_video(b) != "avi":
        raise ValueError("not an AVI payload (bad RIFF/AVI magic)")
    meta: dict = {}
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        pos = start
        while pos + 8 <= end:
            fourcc = b[pos : pos + 4]
            (size,) = struct.unpack_from("<I", b, pos + 4)
            payload_at = pos + 8
            if fourcc == b"LIST":
                walk(payload_at + 4, payload_at + size)
            elif fourcc == b"avih":
                (upf,) = struct.unpack_from("<I", b, payload_at)
                nf, = struct.unpack_from("<I", b, payload_at + 16)
                w, h = struct.unpack_from("<II", b, payload_at + 32)
                meta.update(
                    width=w, height=h, n_frames=nf, us_per_frame=upf
                )
            elif fourcc == b"strh":
                if b[payload_at : payload_at + 4] == b"vids":
                    codec = b[payload_at + 4 : payload_at + 8]
                    if codec != b"MJPG":
                        raise NotImplementedError(
                            f"AVI video codec {codec!r} unsupported (MJPG only)"
                        )
            elif fourcc[2:4] in (b"dc", b"db"):
                frames.append(b[payload_at : payload_at + size])
            pos = payload_at + size + (size % 2)

    walk(12, len(b))
    if not meta:
        raise ValueError("AVI missing avih header")
    return meta, frames


def decode_frame(jpeg_bytes: bytes) -> np.ndarray:
    from hadoop_source_spark.llmops.jpegcodec import decode_jpeg

    return decode_jpeg(jpeg_bytes)


def sample_frame_indices(n_frames: int, num_samples: int) -> list[int]:
    """Evenly spaced frame indices (first..last inclusive), the standard
    uniform temporal sampling for video feature extraction."""
    if n_frames <= 0:
        return []
    if num_samples >= n_frames:
        return list(range(n_frames))
    step = (n_frames - 1) / max(num_samples - 1, 1)
    return sorted({round(i * step) for i in range(num_samples)})
