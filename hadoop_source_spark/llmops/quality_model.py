"""Trained quality classifier for corpus filtering — the
fasttext-style linear model used by GPT-3/CCNet-era pipelines to keep
web documents that "look like" a trusted reference corpus (Brown et al.
2020 appendix A; CCNet, Wenzek et al. 2020): logistic regression over
hashed bag-of-words features.

Scale shape, explicitly (same contract as IVF training and BPE):
- TRAINING is driver-side numpy on a BOUNDED labeled sample
  (``sample_cap`` docs, deterministic order) — full-batch gradient
  descent with fixed iterations and learning rate, so the weights are a
  pure function of the sample.
- SCORING is distributed and shuffle-light: explode tokens → hash
  bucket (JVM xxhash64) → equi-join the BROADCAST (bucket, weight)
  table → one per-doc sum → sigmoid. Work is one pass over the corpus;
  the model is B+1 floats regardless of vocabulary.

This complements llmops/selection.py (DSIR): DSIR is the generative
log-ratio statistic (SQL-oracle-able), this is the discriminative
trained model (iterative — validated by held-out accuracy in pytest,
rows-only at the driver)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_source_spark.llmops.dedup import tokens


def _bucket_col(text_col: str, hash_buckets: int, bucket_mode: str = "xxhash"):
    """Token → feature-bucket array. ``bucket_mode='xxhash'`` is the
    production hash (JVM, fastest); ``'md5'`` buckets on the first 8 hex
    chars of md5 — bit-identical in DuckDB (``('0x' ||
    substr(md5(t),1,8))::BIGINT``), which is what makes the pinned-weight
    scorer slice SQL-oracle-able."""
    if bucket_mode == "md5":
        tok_hash = (
            "cast(conv(substring(md5(encode(t, 'UTF-8')), 1, 8), 16, 10)"
            " as bigint)"
        )
    elif bucket_mode == "xxhash":
        tok_hash = "xxhash64(t)"
    else:
        raise ValueError(f"unknown bucket_mode: {bucket_mode!r}")
    return F.expr(
        f"transform(filter(split(lower({text_col}), '[^\\\\w]+'), "
        f"t -> t != ''), t -> pmod({tok_hash}, {hash_buckets}))"
    )


def train_quality_classifier(
    df: DataFrame,
    labels: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
    hash_buckets: int = 4096,
    sample_cap: int = 5_000,
    iters: int = 200,
    lr: float = 1.0,
    l2: float = 1e-3,
):
    """Returns (weights ndarray[hash_buckets], bias float). Features are
    L1-normalized hashed unigram counts; labels are 0/1."""
    import numpy as np

    sample = (
        df.select(id_col, _bucket_col(text_col, hash_buckets).alias("__b"))
        .join(labels.select(id_col, label_col), id_col)
        .orderBy(id_col)
        .limit(sample_cap)
        .collect()
    )
    n = len(sample)
    if n == 0:
        raise ValueError("no labeled sample rows")
    x = np.zeros((n, hash_buckets), dtype=np.float32)
    y = np.zeros(n, dtype=np.float32)
    for i, row in enumerate(sample):
        y[i] = float(row[label_col])
        bs = row["__b"] or []
        if bs:
            for b in bs:
                x[i, b] += 1.0
            x[i] /= len(bs)
    # float32 throughout: mixing float64 weights with the float32 feature
    # matrix would silently promote (and re-allocate) the whole matrix on
    # EVERY iteration — measured 25x the training wall.
    w = np.zeros(hash_buckets, dtype=np.float32)
    bias = np.float32(0.0)
    lr32, l232 = np.float32(lr), np.float32(l2)
    for _ in range(iters):
        z = x @ w + bias
        p = np.float32(1.0) / (np.float32(1.0) + np.exp(-z))
        g = p - y
        w -= lr32 * (x.T @ g / np.float32(n) + l232 * w)
        bias -= lr32 * g.mean(dtype=np.float32)
    return w, float(bias)


def score_quality(
    df: DataFrame,
    weights,
    bias: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_buckets: int = 4096,
    threshold: float = 0.5,
    bucket_mode: str = "xxhash",
) -> DataFrame:
    """Distributed scoring: (id, n_toks, quality_score, keep). Empty
    docs score sigmoid(bias)."""
    import math

    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(weights) if v != 0.0],
        "__b long, __w double",
    )
    pos = df.select(
        F.col(id_col),
        F.explode(_bucket_col(text_col, hash_buckets, bucket_mode)).alias(
            "__b"
        ),
    )
    sums = (
        pos.join(F.broadcast(wdf), "__b")
        .groupBy(id_col)
        .agg(F.sum("__w").alias("__sw"))
    )
    counts = df.select(
        id_col, F.size(tokens(F.col(text_col))).cast("long").alias("n_toks")
    )
    z = F.lit(float(bias)) + F.coalesce(
        F.col("__sw") / F.col("n_toks"), F.lit(0.0)
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (
        counts.join(sums, id_col, "left")
        .select(
            id_col,
            "n_toks",
            F.round(
                F.when(F.col("n_toks") > 0, score).otherwise(
                    F.lit(1.0 / (1.0 + math.exp(-bias)))
                ),
                6,
            ).alias("quality_score"),
        )
        .withColumn("keep", F.col("quality_score") >= threshold)
    )
