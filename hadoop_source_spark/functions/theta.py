"""Mergeable Theta sketch stores — distinct-set ALGEBRA as state
(Apache DataSketches Theta via Spark 4's theta_sketch_agg family).

HLL (functions/hll.py) unions only; Theta adds INTERSECTION and
DIFFERENCE over the same store-not-raws layout, which is what retention
/ overlap / churn questions need: |users(day d) ∩ users(day d+1)| is a
sketch intersection of two store rows — metadata-scale — where the
exact answer is a full self-join of the raw events. The reference has
no sketch layer at all (its closest surface is per-metric counters);
this is beyond-reference capability in the warehouse direction.

Error: theta intersections estimate within the theta bound of the
SMALLER operand (~1.6% at default lgNomEntries=12 for sets that fill
the sketch); verification uses the est_ok-within-bound pattern, same
as the HLL store."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_store(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    lg_nom: int = 12,
) -> DataFrame:
    """One row per group: (group_cols..., sketch, n_rows)."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(key_col, F.lit(lg_nom)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def estimate(store: DataFrame, group_cols: list[str]) -> DataFrame:
    return store.select(
        *group_cols, F.theta_sketch_estimate("sketch").alias("distinct_est")
    )


def union_rollup(store: DataFrame, roll_cols: list[str]) -> DataFrame:
    """|A ∪ B ∪ ...| up to a coarser grouping — sketch union algebra."""
    g = store.groupBy(*roll_cols) if roll_cols else store.groupBy()
    return g.agg(F.theta_union_agg("sketch").alias("sketch")).select(
        *roll_cols, F.theta_sketch_estimate("sketch").alias("distinct_est")
    )


def pairwise_overlap(
    store: DataFrame,
    group_col: str,
    pair_of: "F.Column | None" = None,
) -> DataFrame:
    """|group_i ∩ group_j| for (i, j = pair_of(i)) — e.g. consecutive
    days for retention. `pair_of` maps the group key to its partner
    (default: identity + 1 lexicographic successor must be provided by
    the caller via a computed column). Emits (group_a, group_b,
    overlap_est) from two store rows per pair; no raw data touched."""
    a = store.select(
        F.col(group_col).alias("group_a"), F.col("sketch").alias("__sa")
    )
    b = store.select(
        F.col(group_col).alias("group_b"), F.col("sketch").alias("__sb")
    )
    key = pair_of if pair_of is not None else F.col("group_a")
    return (
        a.withColumn("__match", key)
        .join(b, F.col("__match") == F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            F.theta_sketch_estimate(
                F.theta_intersection("__sa", "__sb")
            ).alias("overlap_est"),
            # churn: members of A absent from B — the A-NOT-B difference
            # (the third theta operation; HLL has no analog)
            F.theta_sketch_estimate(
                F.theta_difference("__sa", "__sb")
            ).alias("churn_est"),
        )
    )
