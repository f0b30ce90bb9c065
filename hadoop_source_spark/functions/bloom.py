"""Distributed Bloom filter with the reference's full contract.

Reference: common/util/bloom/BloomFilter.java — add (:108), membershipTest
(:143, NO false negatives), and the set algebra and/or/xor (:131,164,175);
BloomMapFile gates lookups on it (common/io/BloomMapFile.java:264
probablyHasKey). DynamicBloomFilter/CountingBloomFilter extend the same
bit-matrix model.

Representation: a DataFrame of (word_idx long, word long) — the non-zero
64-bit words of the bit array. Sparse, shuffle-friendly, and the algebra
is a keyed join with bitwise ops. Building is one explode + groupBy
(map-side partial bit_or); probing is one equi-join on word_idx.

At 100 TB: build-side output is at most num_bits/64 rows regardless of
input size (bounded state); probe joins broadcast the filter when small —
which is exactly BloomMapFile's "index in memory, data on disk" shape.
Note Spark's own runtime bloom-filter join provides the query-optimizer
version of this automatically; this module exists for the reference's
EXPLICIT filter objects and their algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(key, num_bits: int, num_hashes: int):
    """k bit positions per key: pmod(xxhash64(key, i), m)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.pmod(F.xxhash64(key, i), F.lit(num_bits)),
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """BloomFilter.add over every row's key → (word_idx, word) table."""
    pos = df.select(
        F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("__p")
    )
    return (
        pos.select(
            (F.col("__p") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, cast(__p % 64 AS INT))").alias("__mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("word"))
    )


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """BloomFilter.membershipTest per probe row: `might_contain` column.

    True iff ALL k positions are set. Guarantees no false negatives for
    keys that were added (same hash family, same m)."""
    exploded = probes.select(
        F.col(key_col),
        F.posexplode(_positions(F.col(key_col), num_bits, num_hashes)).alias(
            "__i", "__p"
        ),
    ).select(
        key_col,
        "__i",
        (F.col("__p") / 64).cast("long").alias("word_idx"),
        F.expr("shiftleft(1L, cast(__p % 64 AS INT))").alias("__mask"),
    )
    hit = (
        exploded.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            key_col,
            (
                F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("__mask"))
                != 0
            ).alias("__hit"),
        )
        .groupBy(key_col)
        .agg((F.count(F.lit(1)) == F.sum(F.when(F.col("__hit"), 1).otherwise(0))).alias("might_contain"))
    )
    return hit


def _algebra(b1: DataFrame, b2: DataFrame, op: str) -> DataFrame:
    j = (
        b1.selectExpr("word_idx", "word AS w1")
        .join(b2.selectExpr("word_idx", "word AS w2"), "word_idx", "full_outer")
        .select(
            "word_idx",
            F.coalesce("w1", F.lit(0)).alias("w1"),
            F.coalesce("w2", F.lit(0)).alias("w2"),
        )
    )
    expr = {"and": "w1 & w2", "or": "w1 | w2", "xor": "w1 ^ w2"}[op]
    return (
        j.select("word_idx", F.expr(expr).alias("word"))
        .filter(F.col("word") != 0)
    )


def counting_bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """CountingBloomFilter (common/util/bloom/CountingBloomFilter.java:105):
    per-position counters instead of bits → supports delete and
    approximate multiplicity. Representation: (pos, count)."""
    return (
        df.select(
            F.explode(
                _positions(F.col(key_col), num_bits, num_hashes)
            ).alias("pos")
        )
        .groupBy("pos")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def counting_bloom_delete(
    cbf: DataFrame,
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """CountingBloomFilter.delete: decrement the deleted keys' positions."""
    dec = counting_bloom_build(df, key_col, num_bits, num_hashes).select(
        "pos", F.col("count").alias("__dec")
    )
    return (
        cbf.join(dec, "pos", "left")
        .select(
            "pos",
            (F.col("count") - F.coalesce("__dec", F.lit(0))).alias("count"),
        )
        .filter(F.col("count") > 0)
    )


def counting_bloom_approx_count(
    cbf: DataFrame,
    probes: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Approximate multiplicity = min over the key's positions' counters
    (the count-min estimate; CountingBloomFilter.approximateCount).
    Never under-counts an inserted key."""
    exploded = probes.select(
        F.col(key_col),
        F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("pos"),
    )
    return (
        exploded.join(F.broadcast(cbf), "pos", "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("count", F.lit(0))).alias("approx_count"))
    )


def bloom_and(b1: DataFrame, b2: DataFrame) -> DataFrame:
    """BloomFilter.and (:131): approximate set intersection."""
    return _algebra(b1, b2, "and")


def bloom_or(b1: DataFrame, b2: DataFrame) -> DataFrame:
    """BloomFilter.or (:164): exact-union filter (A∪B adds still probe true)."""
    return _algebra(b1, b2, "or")


def bloom_xor(b1: DataFrame, b2: DataFrame) -> DataFrame:
    """BloomFilter.xor (:175): symmetric-difference approximation."""
    return _algebra(b1, b2, "xor")
