"""Count-min sketch: the fixed-memory multiset-frequency summary
(Cormode & Muthukrishnan 2005, public) that complements the bloom /
counting-bloom / HLL family (reference analog: hadoop-common's
bloom-filter util package — CountingBloomFilter approximates the same
multiset-count query with a different space/error trade-off).

Spark-first shape: the sketch IS a DataFrame of (seed, slot, count) —
d×w rows total regardless of input size. Building is one explode(d) +
groupBy with map-side partial aggregation, so the shuffle carries at
most d×w rows per upstream partition; merging sketches is a further
groupBy-sum (the sketch is a monoid, which is what makes it
stream/partition-friendly). Probing is an equi-join on (seed, slot) +
a min-over-seeds aggregate.

The row hash is the Knuth multiplicative scheme over a pre-modded key
((key % 1000003 + seed·7961 + 17) · 2654435761) % w — every product
stays far below 2^63 (ANSI-safe, no masking games) and the SAME
arithmetic runs in ANSI SQL, so unlike xxhash-based sketches the whole
structure is DuckDB-oracle-exact, not just property-tested."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P = 1_000_003
_STEP = 7_961
_KNUTH = 2_654_435_761


def _slot(key: Column, seed: Column, width: int) -> Column:
    return F.pmod(
        (F.pmod(key, F.lit(_P)) + seed * _STEP + 17) * F.lit(_KNUTH),
        F.lit(width),
    )


def cms_build(
    df: DataFrame, key_col: str, width: int = 256, depth: int = 3
) -> DataFrame:
    """Sketch a key stream into d×w counters: (seed, slot, cnt)."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    return (
        df.select(F.col(key_col).alias("__k"))
        .select("__k", seeds)
        .select("seed", _slot(F.col("__k"), F.col("seed"), width).alias("slot"))
        .groupBy("seed", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Pointwise counter sum — the monoid merge used across partitions,
    batches, or days."""
    return (
        a.unionByName(b).groupBy("seed", "slot").agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Point-query the sketch: min over the d counters a key hashes to.
    Never under-estimates; over-estimates by collision mass only."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    lanes = probes.select(F.col(key_col), seeds).select(
        key_col,
        "seed",
        _slot(F.col(key_col), F.col("seed"), width).alias("slot"),
    )
    return (
        lanes.join(sketch, ["seed", "slot"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
