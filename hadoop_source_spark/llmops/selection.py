"""Data selection for LM training corpora: DSIR-style importance
weighting (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" — hashed n-gram bag features, importance weight =
log-likelihood ratio between a TARGET feature distribution and the RAW
corpus distribution).

Spark-first shape: the two distributions are token-level groupBy counts
(map-side partial agg), the per-feature log-ratio table is joined back to
the exploded token stream by one hash equi-join, and the per-doc weight is
one more groupBy — nothing quadratic, no driver-side state, all scalars
carried in-plan via a broadcast one-row cross join. With
``hash_buckets=B`` the feature space is capped at B regardless of vocab
size (DSIR's hashing trick — the 100 TB path, where the log-ratio table is
a broadcast-sized B-row dimension); with ``hash_buckets=None`` features
are exact token strings, which is what the DuckDB oracle recomputes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_source_spark.llmops.dedup import tokens


def dsir_weights(
    df: DataFrame,
    target_ids: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_buckets: int | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Per-document DSIR importance weight and selection flag.

    weight(doc) = mean over token positions of
        ln( (tc+1) / (T_t+V) ) - ln( (rc+1) / (T_r+V) )
    with tc/rc the feature's count in the target/raw unigram
    distribution, T_t/T_r the total token counts, V the raw vocabulary
    size (add-one smoothing over the raw vocab, which is a superset of
    the target vocab). selected = weight > 0: the doc is more probable
    under the target distribution than under the corpus distribution.

    Returns (id, n_toks, dsir_logratio, selected). Zero-token docs get
    weight 0.0 and selected = false. The flag is computed from the
    ROUNDED weight so an oracle comparing at ``round_dp`` decimals sees
    an identical boundary.
    """
    feat = F.explode(tokens(F.col(text_col))).alias("tok")
    toks = df.select(F.col(id_col), feat)
    if hash_buckets is not None:
        toks = toks.select(
            id_col, F.pmod(F.xxhash64("tok"), F.lit(hash_buckets)).alias("tok")
        )
    # Fuse the raw and target unigram counts into ONE aggregation
    # (r14, guide §1.2/§2.4): the old shape evaluated the corpus
    # explode THREE times (raw counts, target counts, the per-doc
    # score join) — 8 source scans in one plan. A left-joined target
    # flag counted conditionally gives the exact (rc, tc) pair the old
    # raw⋈tgt join produced (distinct() preserves left_semi's
    # indifference to duplicate target ids). The token stream itself
    # is deliberately NOT checkpointed: it flows straight into
    # map-side partial aggregation, and materializing pre-aggregation
    # rows costs more than the one remaining re-derivation (measured
    # 2x locally; guide §2.3 "aggregate before you shuffle").
    tflag = target_ids.select(F.col(id_col)).distinct().withColumn(
        "__t", F.lit(1)
    )
    feats = (
        toks.join(tflag, id_col, "left")
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("rc"),
            F.count("__t").alias("tc"),
        )
        # NOT checkpointed: a materialized table loses its size
        # estimate and the ratios join stopped broadcasting (measured
        # slower); the double consumption below (totals + ratios)
        # re-derives one fused pass, still down from the old shape's
        # two-passes-twice.
    )
    scalars = feats.agg(
        F.sum("rc").alias("t_raw"),
        F.sum("tc").alias("t_tgt"),
        F.count(F.lit(1)).alias("vocab"),
    )
    ratios = feats.crossJoin(F.broadcast(scalars)).select(
        "tok",
        (
            F.log((F.col("tc") + 1) / (F.col("t_tgt") + F.col("vocab")))
            - F.log((F.col("rc") + 1) / (F.col("t_raw") + F.col("vocab")))
        ).alias("lr"),
    )
    perdoc = (
        toks.join(ratios, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.avg("lr").alias("w"),
        )
    )
    return (
        df.select(id_col)
        .join(perdoc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_toks", F.lit(0)).cast("long").alias("n_toks"),
            F.round(F.coalesce("w", F.lit(0.0)), round_dp).alias(
                "dsir_logratio"
            ),
        )
        .withColumn("selected", F.col("dsir_logratio") > 0)
    )
