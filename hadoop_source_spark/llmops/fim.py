"""Fill-in-the-middle (FIM) training-data transformation
(Bavarian et al. 2022, "Efficient Training of Language Models to
Fill in the Middle"): with some rate, split a document into
(prefix, middle, suffix) at two uniform cut points and emit the
rearranged sequence with sentinel tokens so an autoregressive model
learns infilling. The paper applies the split at the document level
(character level before tokenization) — exactly what we do here.

Sentinel layouts (documented here, applied verbatim in tests and
oracles):
  PSM:  <PRE> prefix <SUF> suffix <MID> middle
  SPM:  <SUF> suffix <PRE> prefix <MID> middle   (the swapped variant)

Determinism: the apply decision, both cut points, and the PSM/SPM
choice are hash-bucket functions of the doc id (seed-offset so the
four decisions are independent), making the transform reproducible
and SQL-checkable — the stand-in for the paper's RNG draws, same
convention as the sampling module.

Spark-first scale shape: one codegen projection — substring/concat
arithmetic only, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_source_spark.llmops.sampling import _BUCKETS, hash_bucket

PRE, SUF, MID = "<PRE>", "<SUF>", "<MID>"


def fim_transform(
    docs: DataFrame,
    fim_rate: float,
    spm_rate: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    impl: str = "xxhash",
) -> DataFrame:
    """Emit the FIM-rearranged training text for every document.

    Returns id, mode (PSM / SPM / NONE), the rearranged `output`,
    and the three span lengths (zero-width middles are legal — the
    paper keeps them so the model learns empty infills)."""
    L = F.length(F.col(text_col))
    applied = hash_bucket(id_col, seed, impl) < int(
        round(fim_rate * _BUCKETS)
    )
    spm = hash_bucket(id_col, seed + 1, impl) < int(
        round(spm_rate * _BUCKETS)
    )
    # two independent uniform cut points in [0, L], order-normalized
    u1 = hash_bucket(id_col, seed + 2, impl)
    u2 = hash_bucket(id_col, seed + 3, impl)
    c1 = F.floor(u1 * (L + 1) / _BUCKETS).cast("int")
    c2 = F.floor(u2 * (L + 1) / _BUCKETS).cast("int")
    i = F.least(c1, c2)
    j = F.greatest(c1, c2)
    prefix = F.substring(F.col(text_col), F.lit(1), i)
    middle = F.substring(F.col(text_col), i + 1, j - i)
    suffix = F.substring(F.col(text_col), j + 1, L - j)
    psm_out = F.concat(
        F.lit(PRE), prefix, F.lit(SUF), suffix, F.lit(MID), middle
    )
    spm_out = F.concat(
        F.lit(SUF), suffix, F.lit(PRE), prefix, F.lit(MID), middle
    )
    mode = (
        F.when(~applied, F.lit("NONE"))
        .when(spm, F.lit("SPM"))
        .otherwise(F.lit("PSM"))
    )
    return docs.select(
        id_col,
        mode.alias("mode"),
        F.when(~applied, F.col(text_col))
        .when(spm, spm_out)
        .otherwise(psm_out)
        .alias("output"),
        F.when(applied, i).otherwise(L).cast("long").alias("len_prefix"),
        F.when(applied, j - i).otherwise(F.lit(0))
        .cast("long")
        .alias("len_middle"),
        F.when(applied, L - j).otherwise(F.lit(0))
        .cast("long")
        .alias("len_suffix"),
    )
