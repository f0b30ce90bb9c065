"""Document chunking for retrieval / training-context pipelines.

Public semantics (LangChain's CharacterTextSplitter / fixed-stride
sliding windows, the standard RAG ingestion shape): split every
document into windows of `size` characters advancing by `stride =
size - overlap`, carry provenance (doc id, chunk index, absolute
half-open [start, end) offsets), keep the tail chunk even when short.
In the reference repo the analogous machinery is the fixed-size block
split of file content (`hdfs/server/blockmanagement/BlockInfo` block
boundaries) — same math, bytes → characters.

Spark-first: chunk fan-out is `sequence()` + `posexplode` +
`substring` — pure codegen projection, no UDF, no shuffle; the output
size is data-proportional and every chunk row stays independent, so
the plan is a flat map at any scale.

Reconstruction invariant (pytest-pinned): concatenating each chunk's
leading `stride` characters (all of the last chunk) rebuilds the
document byte-for-byte — no character lost or duplicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """One row per chunk: id_col, chunk_idx, start, end, chunk (text),
    chunk_len, n_chunks. Offsets are 0-based half-open; `substring` is
    1-based, hence the +1. Empty documents yield one empty chunk so no
    document silently disappears from the corpus."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    n = F.greatest(
        F.ceil(
            (F.length(F.col(text_col)) - F.lit(overlap))
            / F.lit(float(stride))
        ),
        F.lit(1),
    ).cast("int")
    chunks = docs.select(
        id_col,
        F.length(F.col(text_col)).alias("__len"),
        F.posexplode(F.sequence(F.lit(0), n - 1)).alias("chunk_idx", "__i"),
        F.col(text_col).alias("__text"),
        n.alias("n_chunks"),
    )
    start = F.col("chunk_idx") * stride
    return chunks.select(
        id_col,
        "chunk_idx",
        start.alias("start"),
        F.least(start + size, F.col("__len")).alias("end"),
        F.substring(F.col("__text"), start + 1, size).alias("chunk"),
        (F.least(start + size, F.col("__len")) - start).alias("chunk_len"),
        "n_chunks",
    )
