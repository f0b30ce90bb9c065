"""Balancer move planning (reference: hdfs/server/balancer/Balancer.java
— classify datanodes against average utilization with a threshold band,
then pair over-utilized sources with under-utilized targets until every
node is within the band).

Spark-first shape: per-node utilization is one partial-agg groupBy of
the block/file table (the only data-sized pass). Everything after runs
on a NODE-COUNT-sized table: the greedy source→target pairing the
reference does with iterators is expressed as cumulative-interval
matching — stack the excess bytes of over-nodes and the deficit bytes
of under-nodes on one number line with window cumsums, and every
overlap of an excess interval with a deficit interval IS a move. The
interval join is a theta join, fine here because both sides are node
lists (metadata-sized, broadcast), never data."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def utilization(
    df: DataFrame, node_col: str, bytes_col: str
) -> DataFrame:
    """Per-node byte totals + the fleet average (single-row broadcast)."""
    per_node = df.groupBy(F.col(node_col).alias("node")).agg(
        F.sum(bytes_col).alias("used")
    )
    avg = per_node.agg(F.avg("used").alias("avg_used"))
    return per_node.crossJoin(F.broadcast(avg))


def move_plan(
    df: DataFrame,
    node_col: str,
    bytes_col: str,
    threshold: float = 0.1,
) -> DataFrame:
    """Emit (src, dst, move_bytes) shedding every over-utilized node
    down to the average and filling every under-utilized node up to it.

    Over-nodes' excess and under-nodes' deficit are laid out as
    cumulative intervals (deterministic order: excess desc, node asc —
    the reference also drains the most-loaded first); each overlap pair
    is one move, so total moved bytes == total excess, and no node ends
    outside the band. Bytes are integral — floor the average so both
    engines agree exactly.
    """
    util = utilization(df, node_col, bytes_col).select(
        "node", "used", F.floor("avg_used").alias("avg")
    )
    over = util.filter(F.col("used") > F.col("avg") * (1 + threshold)).select(
        "node", (F.col("used") - F.col("avg")).alias("amt")
    )
    under = util.filter(F.col("used") < F.col("avg") * (1 - threshold)).select(
        "node", (F.col("avg") - F.col("used")).alias("amt")
    )
    w = Window.orderBy(F.col("amt").desc(), F.col("node")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # node-count-sized frames: the global window is deliberate and bounded
    stack = lambda d: d.select(  # noqa: E731
        "node",
        F.coalesce(F.sum("amt").over(w), F.lit(0)).alias("lo"),
        (F.coalesce(F.sum("amt").over(w), F.lit(0)) + F.col("amt")).alias("hi"),
    )
    o = stack(over).select(
        F.col("node").alias("src"), F.col("lo").alias("olo"), F.col("hi").alias("ohi")
    )
    u = stack(under).select(
        F.col("node").alias("dst"), F.col("lo").alias("ulo"), F.col("hi").alias("uhi")
    )
    moves = (
        o.join(
            F.broadcast(u),
            (F.col("olo") < F.col("uhi")) & (F.col("ulo") < F.col("ohi")),
        )
        .select(
            "src",
            "dst",
            (
                F.least("ohi", "uhi") - F.greatest("olo", "ulo")
            ).alias("move_bytes"),
        )
        .filter(F.col("move_bytes") > 0)
    )
    return moves
