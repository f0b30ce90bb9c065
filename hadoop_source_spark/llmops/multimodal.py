"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched pandas on mapInPandas.

Decode and resize are REAL for the uncompressed image codecs (24-bit
BMP, binary PPM — pure-numpy kernels in llmops/imagecodec.py).
Compressed codecs (JPEG/PNG) and audio/video decode need libraries NOT
in this container — those remain STUBBED (clearly marked): magic-sniffed
and loudly NotImplementedError, with deterministic fakes where a
fallback keeps the pipeline testable. The Spark-side plumbing is real
and tested throughout: schema contract, Arrow batch shape,
partition-parallel mapInPandas, and the metadata extraction path.

Scale notes: mapInPandas streams Arrow record batches — no per-row Python
overhead; binary payloads stay out of shuffles unless explicitly selected
(column pruning drops them); `spark.sql.execution.arrow.maxRecordsPerBatch`
bounds executor memory per batch for multi-MB payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id long, n_bytes int, md5 string, fake_width int, fake_height int"
)


def with_payload(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Attach a binary payload column (UTF-8 bytes of the text — the test
    stand-in for image/audio bytes) plus a media-type tag."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
    )


def extract_meta(
    payloads: DataFrame,
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Per-payload metadata via mapInPandas (Arrow batches).

    n_bytes/md5 are real; fake_width/fake_height stand in for the decode
    step (STUB — deterministic function of the byte length, replace with a
    real image decode where PIL/ffmpeg are available).

    ``passthrough`` columns of ``payloads`` are carried across the Arrow
    boundary unchanged and appended to the output, so a caller can fuse
    downstream JVM projections over this kernel's single scan instead of
    paying a second corpus scan plus a join to re-widen (guide §2.4 — at
    corpus cardinality that join is a full shuffle of both sides; the
    bench-scale broadcast it picks locally does not survive 100 TB).
    """
    extra = [payloads.schema[c] for c in passthrough]
    schema = META_SCHEMA + "".join(
        f", {f.name} {f.dataType.simpleString()}" for f in extra
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            payload = pdf["payload"]
            n_bytes = payload.map(len).astype("int32")
            out = {
                "doc_id": pdf[id_col],
                "n_bytes": n_bytes,
                "md5": payload.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
                "fake_width": (n_bytes % 1920).astype("int32"),
                "fake_height": (n_bytes % 1080).astype("int32"),
            }
            for c in passthrough:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return payloads.mapInPandas(batches, schema)


def resize_images(
    payloads: DataFrame, width: int = 64, height: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Thumbnail/resize step via mapInPandas — payload bytes in, resized
    bytes + dims out. REAL for every sniffable codec: BMP/PPM/PNG/JPEG
    payloads decode (imagecodec.decode_any), nearest-neighbor resample
    to width×height, and re-encode in their own format
    (imagecodec.ENCODERS). Non-image payloads (the text stand-ins used
    at test scale) keep the deterministic sha256-derived fake so the
    pipeline shape is exercised end-to-end even where no codec applies;
    exotic variants raise in decode_any and also fall back to the
    fake."""

    from hadoop_source_spark.llmops.imagecodec import (
        ENCODERS,
        decode_any,
        nn_resize,
    )

    def _resize(b: bytes) -> bytes:
        try:
            codec, arr = decode_any(b)
        except (ValueError, NotImplementedError):
            # fake thumbnail for non-image / exotic payloads
            seed = hashlib.sha256(b + f"{width}x{height}".encode()).digest()
            reps = max(1, (width * height) // (64 * len(seed)))
            return seed * reps
        small = nn_resize(arr, width, height)
        return ENCODERS[codec](small)

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "thumbnail": pdf["payload"].map(
                        lambda b: _resize(bytes(b))
                    ),
                }
            )

    return payloads.mapInPandas(
        batches, "doc_id long, width int, height int, thumbnail binary"
    )


def sample_frames(
    payloads: DataFrame, num_frames: int = 4, frame_bytes: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame sampling via mapInPandas — a row-EXPANDING (UDTF-like)
    batch kernel: each payload yields evenly spaced frames as
    (doc_id, frame_idx, frame).

    REAL for MJPEG-in-AVI payloads (llmops/videocodec.py parses the
    RIFF container; each emitted `frame` is that sampled frame's actual
    JPEG bytes, which decode_image then turns into pixels — the full
    video → frames → pixels → features chain runs for real). Other
    containers (MP4/MKV) are sniffed and raise NotImplementedError;
    non-video payloads keep the deterministic byte-window stand-in so
    the pipeline shape stays exercised where no codec applies."""
    from hadoop_source_spark.llmops.videocodec import (
        parse_avi,
        sample_frame_indices,
        sniff_video,
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(b)
                if not raw:
                    continue
                codec = sniff_video(raw)
                if codec == "avi":
                    _meta, all_frames = parse_avi(raw)
                    for i in sample_frame_indices(len(all_frames), num_frames):
                        ids.append(doc_id)
                        idxs.append(i)
                        frames.append(all_frames[i])
                    continue
                if codec in ("mp4", "mkv"):
                    raise NotImplementedError(
                        f"{codec} demux requires a codec library "
                        "not in this container"
                    )
                step = max(1, (len(raw) - frame_bytes) // max(1, num_frames - 1))
                for i in range(num_frames):
                    off = min(i * step, max(0, len(raw) - frame_bytes))
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(raw[off : off + frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return payloads.mapInPandas(
        batches, "doc_id long, frame_idx int, frame binary"
    )


def embed_features(
    payloads: DataFrame, dim: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Feature-extraction step: payload → fixed-dim float vector, batched
    through Arrow. The embedding model is STUBBED with a deterministic
    hash-seeded projection (a real encoder slots into the same kernel);
    the output column composes directly with the similarity operators
    (brute_force_topk / lsh_topk / ivf_topk)."""
    import numpy as np

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            vecs = []
            for b in pdf["payload"]:
                seed = int.from_bytes(
                    hashlib.sha256(bytes(b)).digest()[:8], "big"
                ) % (2**32)
                rs = np.random.RandomState(seed)
                v = rs.standard_normal(dim).astype(np.float32)
                vecs.append((v / np.linalg.norm(v)).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col], "features": vecs})

    return payloads.mapInPandas(
        batches, "doc_id long, features array<float>"
    )


def decode_audio(
    payloads: DataFrame, id_col: str = "doc_id", on_error: str = "raise"
) -> DataFrame:
    """REAL audio decode for uncompressed WAV/PCM16 (pure-numpy kernel in
    llmops/audiocodec.py), same mapInPandas batch contract as
    decode_image: payload bytes in, (sample_rate, n_samples, channels,
    interleaved int16 pcm bytes) out. Compressed audio (MP3/OGG/FLAC) is
    magic-sniffed and stays STUBBED with a loud NotImplementedError."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be raise|skip, got {on_error!r}")

    from hadoop_source_spark.llmops.audiocodec import decode_wav, sniff_audio

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, rates, ns, chs, pcms = [], [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(b)
                codec = sniff_audio(raw)
                try:
                    if codec in ("mp3", "ogg", "flac"):
                        raise NotImplementedError(
                            f"{codec} decode requires a codec library "
                            "not in this container"
                        )
                    rate, pcm = decode_wav(raw)
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    continue
                ids.append(doc_id)
                rates.append(rate)
                ns.append(pcm.shape[0])
                chs.append(pcm.shape[1])
                pcms.append(pcm.astype("<i2").tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "channels": pd.Series(chs, dtype="int32"),
                    "pcm": pd.Series(pcms, dtype="object"),
                }
            )

    return payloads.mapInPandas(
        batches,
        "doc_id long, sample_rate int, n_samples long, channels int, pcm binary",
    )


def audio_features(
    payloads: DataFrame,
    n_bands: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """WAV payload → log band-energy feature vector (audiocodec.
    band_energies): the deterministic cheap audio fingerprint. Output
    composes directly with the similarity operators, like
    embed_features does for images."""
    import numpy as np

    from hadoop_source_spark.llmops.audiocodec import band_energies, decode_wav

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, vecs = [], []
            for doc_id, b in zip(pdf[id_col], pdf["payload"]):
                _rate, pcm = decode_wav(bytes(b))
                v = band_energies(pcm, n_bands=n_bands)
                norm = float(np.linalg.norm(v))
                ids.append(doc_id)
                vecs.append((v / norm if norm > 0 else v).tolist())
            yield pd.DataFrame({"doc_id": ids, "features": vecs})

    return payloads.mapInPandas(
        batches, "doc_id long, features array<float>"
    )


def decode_image(
    payloads: DataFrame, id_col: str = "doc_id", on_error: str = "raise"
) -> DataFrame:
    """REAL image decode for BMP (24-bit), binary PPM, PNG (8-bit
    grey/RGB/RGBA, non-interlaced — stdlib zlib + numpy unfiltering),
    and baseline JPEG (SOF0 sequential DCT, grey / 4:4:4 / 4:2:0 —
    pure-numpy exact-DCT codec in llmops/jpegcodec.py), inside the same
    mapInPandas batch contract as extract_meta: payload bytes in, RGB8
    pixel tensor out as (width, height, flattened h*w*3 bytes).

    Only exotic JPEG variants (progressive/12-bit/arithmetic) remain
    loud NotImplementedError. on_error="skip" drops undecodable
    payloads instead (the corrupt-file-tolerant corpus path).
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be raise|skip, got {on_error!r}")

    from hadoop_source_spark.llmops.imagecodec import decode_any

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, codecs, widths, heights, pixels = [], [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf["payload"]):
                try:
                    codec, arr = decode_any(bytes(b))
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    continue
                ids.append(doc_id)
                codecs.append(codec)
                heights.append(arr.shape[0])
                widths.append(arr.shape[1])
                pixels.append(arr.tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "codec": pd.Series(codecs, dtype="object"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "pixels": pd.Series(pixels, dtype="object"),
                }
            )

    return payloads.mapInPandas(
        batches,
        "doc_id long, codec string, width int, height int, pixels binary",
    )
