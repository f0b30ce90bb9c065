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
