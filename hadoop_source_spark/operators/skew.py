"""Skew mitigation — explicit salting for hot keys.

The reference rebalances storage with the Balancer
(hdfs/server/balancer/Balancer.java:177); the compute-side analog in this
engine is AQE's skew-join splitting (on by default in session.py). This
module adds the EXPLICIT tool for the cases AQE can't fix: a single
pathological groupBy key (AQE splits skewed *join* partitions, not
aggregation hot keys).

salted_agg: two-stage aggregation — stage 1 groups on (key, salt) so a hot
key's rows spread over `buckets` reducers; stage 2 merges the partials.
Works for any algebraic aggregate (sum/count/min/max); average = sum+count
merged at stage 2.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 32,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    aggs: {out_col: (in_col, fn)} with fn in {sum, count, min, max}.
    Equivalent to df.groupBy(keys).agg(...) for these algebraic functions
    (asserted by tests), but no single reducer ever sees a whole hot key.
    """
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salt = (F.rand(seed=42) * buckets).cast("int").alias("__salt")
    partial = (
        df.select("*", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                first[fn](in_col).alias(f"__p_{out}")
                for out, (in_col, fn) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            merge[fn](f"__p_{out}").alias(out)
            for out, (in_col, fn) in aggs.items()
        ]
    )


def salted_broadcast_join(
    big: DataFrame,
    hot_small: DataFrame,
    on: str,
    buckets: int = 16,
) -> DataFrame:
    """Skewed-join fallback when the small side can't broadcast whole:
    replicate the small side across `buckets` salts and join on
    (key, salt). Kept for API parity; with AQE skew-join on, prefer the
    plain join and let the optimizer split."""
    salted_big = big.select(
        "*", (F.rand(seed=7) * buckets).cast("int").alias("__salt")
    )
    exploded_small = hot_small.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("__salt")
    )
    return salted_big.join(
        F.broadcast(exploded_small), on=[on, "__salt"]
    ).drop("__salt")
