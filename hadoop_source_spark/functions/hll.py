"""Mergeable HLL sketch STORES — distinct counting as state, not as a
query (reference analog: the metrics2 MutableQuantiles/estimator family
plus the warehouse-era pattern of persisting per-partition cardinality
summaries; sketches are Apache DataSketches HLL via Spark's built-in
hll_sketch_agg / hll_union_agg / hll_sketch_estimate).

Why this matters at 100 TB: a distinct-users-per-day query over raw
events re-shuffles the raw data every time. A sketch store keeps ONE
row per (group, day) with a few-KB binary sketch; any rollup window
(week, month, all-time, ad-hoc day set) is a union of sketches —
metadata-scale work, no re-scan — and ingest is an incremental merge of
the new day's sketch into the store. Error is the HLL bound (~1.6%/
sqrt(2^lgk) for the default lgConfigK)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_store(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    lgk: int = 12,
) -> DataFrame:
    """One row per group: (group_cols..., sketch, n_rows). One shuffle
    with map-side partial sketch merge (hll_sketch_agg is associative)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key_col, F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def estimate(store: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group_cols..., distinct_est) from a sketch store — no data scan."""
    return store.select(
        *group_cols,
        F.hll_sketch_estimate("sketch").alias("distinct_est"),
    )


def rollup_estimate(store: DataFrame, roll_cols: list[str]) -> DataFrame:
    """Union sketches up to a coarser grouping (e.g. per-day -> total):
    (roll_cols..., distinct_est). Pure sketch algebra on the store."""
    g = store.groupBy(*roll_cols) if roll_cols else store.groupBy()
    return g.agg(F.hll_union_agg("sketch").alias("sketch")).select(
        *roll_cols, F.hll_sketch_estimate("sketch").alias("distinct_est")
    )


def merge_stores(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Incremental ingest: merge a new batch's store into the existing
    one — full-outer on the group, pairwise hll_union of the sketches,
    counts added. merge_stores(store, sketch_store(new_day_rows, ...))
    is the store maintenance step; by HLL mergeability it equals
    rebuilding from all raw rows (pytest-gated). Both stores must have
    been built with the same ``lgk`` (hll_union requires matching
    lgConfigK; mixed-precision stores should be rebuilt, not merged)."""
    an = a.select(
        *group_cols,
        F.col("sketch").alias("__sa"),
        F.col("n_rows").alias("__na"),
    )
    bn = b.select(
        *group_cols,
        F.col("sketch").alias("__sb"),
        F.col("n_rows").alias("__nb"),
    )
    both = an.join(bn, group_cols, "full_outer")
    sketch = (
        F.when(F.col("__sa").isNull(), F.col("__sb"))
        .when(F.col("__sb").isNull(), F.col("__sa"))
        .otherwise(F.hll_union("__sa", "__sb"))
    )
    return both.select(
        *group_cols,
        sketch.alias("sketch"),
        (
            F.coalesce("__na", F.lit(0)) + F.coalesce("__nb", F.lit(0))
        ).alias("n_rows"),
    )
