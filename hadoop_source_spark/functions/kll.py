"""Mergeable KLL quantile sketch STORES — percentiles as state, not as
a query (reference analog: metrics2 MutableQuantiles, which keeps a
streaming SampleQuantiles estimator per metric window,
MutableQuantiles.java:60 / SampleQuantiles.java:50; sketches are Apache
DataSketches KLL via Spark 4's built-in kll_sketch_agg_double family).

Same store contract as functions/hll.py, for rank statistics: one row
per (group, window) holding a few-KB sketch; any coarser rollup window
is a MERGE of sketches (metadata-scale, no raw re-scan) and ingest is
an incremental merge of the new window's sketch. KLL's guarantee is on
RANK, not value: with the default k=200 the 99%-confidence normalized
rank error is ~1.65%, so verification asks "does the exact rank of the
estimated quantile land within eps of the requested rank", never
value-distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_store(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """One row per group: (group_cols..., sketch, n_rows). One shuffle
    with map-side partial sketch merge (KLL agg is associative)."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(value_col, F.lit(k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def quantiles(
    store: DataFrame, group_cols: list[str], ranks: list[float]
) -> DataFrame:
    """(group_cols..., q_<rank>...) from a sketch store — no data scan."""
    return store.select(
        *group_cols,
        *[
            F.kll_sketch_get_quantile_double("sketch", F.lit(p)).alias(
                f"q_{str(p).replace('.', '_')}"
            )
            for p in ranks
        ],
    )


def rollup_store(store: DataFrame, roll_cols: list[str]) -> DataFrame:
    """Merge sketches up to a coarser grouping (per-day -> total):
    still a store (sketch + n_rows), pure sketch algebra."""
    g = store.groupBy(*roll_cols) if roll_cols else store.groupBy()
    return g.agg(
        F.kll_merge_agg_double("sketch").alias("sketch"),
        F.sum("n_rows").alias("n_rows"),
    )


def merge_stores(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Incremental ingest: merge a new window's store into the existing
    one — full-outer on the group, pairwise kll_sketch_merge, counts
    added. By KLL mergeability the result answers quantile queries with
    the same rank guarantee as a store rebuilt from all raw rows
    (pytest-gated)."""
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
        .otherwise(F.kll_sketch_merge_double("__sa", "__sb"))
    )
    return both.select(
        *group_cols,
        sketch.alias("sketch"),
        (
            F.coalesce("__na", F.lit(0)) + F.coalesce("__nb", F.lit(0))
        ).alias("n_rows"),
    )
