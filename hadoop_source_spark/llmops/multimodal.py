"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched pandas on mapInPandas.

The decode/resize/frame-sample kernels need codec libraries that are NOT
in this container — those steps are STUBBED (clearly marked) behind
deterministic fakes, but the Spark-side plumbing is real and tested:
schema contract, Arrow batch shape, partition-parallel mapInPandas, and
the metadata extraction path.

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


def extract_meta(payloads: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-payload metadata via mapInPandas (Arrow batches).

    n_bytes/md5 are real; fake_width/fake_height stand in for the decode
    step (STUB — deterministic function of the byte length, replace with a
    real image decode where PIL/ffmpeg are available).
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            payload = pdf["payload"]
            n_bytes = payload.map(len).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes,
                    "md5": payload.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "fake_width": (n_bytes % 1920).astype("int32"),
                    "fake_height": (n_bytes % 1080).astype("int32"),
                }
            )

    return payloads.mapInPandas(batches, META_SCHEMA)


def resize_images(
    payloads: DataFrame, width: int = 64, height: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Thumbnail/resize step via mapInPandas — the real batch contract
    (payload bytes in, resized bytes + dims out), with the pixel kernel
    STUBBED: no codec libs in this container, so the 'thumbnail' is a
    deterministic sha256-derived byte block. Swap `_fake_resize` for a
    PIL/opencv call and nothing else changes (schema, batching,
    partition-parallelism are the production shape)."""

    def _fake_resize(b: bytes) -> bytes:  # STUB for Image.resize(...)
        seed = hashlib.sha256(b + f"{width}x{height}".encode()).digest()
        # tile the seed to a deterministic width*height/64-ish block
        reps = max(1, (width * height) // (64 * len(seed)))
        return seed * reps

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "thumbnail": pdf["payload"].map(
                        lambda b: _fake_resize(bytes(b))
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
    batch kernel: each payload yields `num_frames` evenly spaced windows
    as (doc_id, frame_idx, frame). The windowing arithmetic is the real
    frame-sampler shape; the codec decode it would wrap is stubbed (the
    'frames' are raw byte windows, not decoded pictures)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(b)
                if not raw:
                    continue
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


def decode_image(payloads: DataFrame):  # pragma: no cover - stub
    """STUB: real image decode requires PIL/opencv (not in container).

    The production implementation decodes inside mapInPandas with the same
    batch contract as extract_meta (payload bytes in, pixel tensor or
    thumbnail bytes out).
    """
    raise NotImplementedError(
        "image decode requires PIL/opencv which are not installed; "
        "use extract_meta for the metadata path"
    )
