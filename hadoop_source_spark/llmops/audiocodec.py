"""Pure-numpy audio codec for uncompressed WAV (RIFF PCM16) plus the
classic deterministic feature kernels (band energies over an rFFT).

Completes the multimodal story the same way imagecodec.py does for
images: the uncompressed container is just a header + interleaved
samples, so decode is exact with no codec library. Compressed audio
(MP3/OGG/FLAC) stays stubbed in multimodal.decode_audio — magic-sniffed
and reported loudly.

Everything operates on a single payload (bytes ↔ int16 ndarray
(n_samples, channels)); batch fan-out is the caller's mapInPandas
contract.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_audio(b: bytes) -> str | None:
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[:3] == b"ID3" or b[:2] in (b"\xff\xfb", b"\xff\xf3", b"\xff\xf2"):
        return "mp3"
    if b[:4] == b"OggS":
        return "ogg"
    if b[:4] == b"fLaC":
        return "flac"
    return None


def encode_wav(pcm: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 (n_samples,) or (n_samples, channels) → RIFF/WAVE PCM16."""
    pcm = np.asarray(pcm, dtype="<i2")
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    data = pcm.tobytes()  # interleaved by construction (C order)
    byte_rate = sample_rate * ch * 2
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, block_align, 16)
    out = b"".join([
        b"RIFF", struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)), b"WAVE",
        b"fmt ", struct.pack("<I", len(fmt)), fmt,
        b"data", struct.pack("<I", len(data)), data,
    ])
    return out


def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 → (sample_rate, int16 ndarray (n_samples, ch)).
    Walks the chunk list (tolerates LIST/fact/etc. between fmt and data),
    PCM16 only — the uncompressed-codec scope of this module."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload (bad magic)")
    pos = 12
    sample_rate = channels = bits = None
    audio_fmt = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if audio_fmt != 1 or bits != 16:
        raise ValueError(
            f"only PCM16 supported, got format={audio_fmt} bits={bits}"
        )
    pcm = np.frombuffer(data, dtype="<i2")
    if channels > 1:
        pcm = pcm.reshape(-1, channels)
    else:
        pcm = pcm[:, None]
    return sample_rate, pcm.copy()


def band_energies(
    pcm: np.ndarray, n_bands: int = 16, frame: int = 1024
) -> np.ndarray:
    """Log band-energy features: mono-mix, frame the signal, rFFT per
    frame, pool |X|² into n_bands equal frequency bands, average over
    frames, log1p. Deterministic float32 (n_bands,) — the standard cheap
    audio fingerprint, numpy-only."""
    x = np.asarray(pcm, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    if len(x) == 0:
        return np.zeros(n_bands, dtype=np.float32)
    n_frames = max(1, len(x) // frame)
    x = x[: n_frames * frame].reshape(n_frames, frame)
    spec = np.abs(np.fft.rfft(x, axis=1)) ** 2  # (frames, frame//2+1)
    bins = spec.shape[1]
    edges = np.linspace(0, bins, n_bands + 1).astype(int)
    bands = np.stack([
        spec[:, edges[i]:max(edges[i + 1], edges[i] + 1)].sum(axis=1)
        for i in range(n_bands)
    ], axis=1)
    return np.log1p(bands.mean(axis=0)).astype(np.float32)
