"""Intra-node disk balancer: volume-to-volume move planning.

Reference semantics (`hdfs/server/diskbalancer/planner/GreedyPlanner.
java:66-140`): for each datanode, loop while balancing is needed —
pick the volume with the most data ABOVE the node's ideal storage
density and the one most BELOW it, schedule the largest possible move
between them (`computeMove`, :168), repeat until every volume sits
within `threshold` of the ideal. The ideal density is the node's
total used bytes over total capacity (`DiskBalancerVolumeSet`), so a
volume's target is `density * capacity` — bigger disks carry
proportionally more.

Spark-first: the greedy loop's FIXED POINT is what matters — every
volume ends within the band, and total moved bytes equals total
excess. That fixed point has a closed form: stack each node's excess
bytes (volumes above ideal) and deficit bytes (volumes below) as
cumulative intervals on one number line (windows PARTITIONED BY
node — never a global sort), and every overlap of an excess interval
with a deficit interval is one move. One data-sized groupBy builds
per-volume usage; everything after runs on the volume-count-sized
table, partition-parallel across nodes — the same interval trick as
`operators/balancer.py`, one level down the storage hierarchy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def volume_density(volumes: DataFrame) -> DataFrame:
    """Per-volume usage vs the node's ideal. Input: node, volume,
    capacity, used. Adds node_used/node_capacity totals, the node's
    ideal density, this volume's integral ideal bytes (floored, so
    both engines agree exactly), and the signed density gap the
    reference thresholds on (`DiskBalancerVolume.getVolumeDataDensity`:
    ideal - used/capacity)."""
    w = Window.partitionBy("node")
    dens = F.col("node_used") / F.col("node_capacity")
    return (
        volumes.withColumn("node_used", F.sum("used").over(w))
        .withColumn("node_capacity", F.sum("capacity").over(w))
        .withColumn("ideal_bytes", F.floor(dens * F.col("capacity")))
        .withColumn(
            "density_gap",
            dens - F.col("used") / F.col("capacity"),
        )
    )


def node_plan(volumes: DataFrame, threshold: float = 0.1) -> DataFrame:
    """(node, src_volume, dst_volume, move_bytes) bringing every volume
    of every node to its integral ideal. Volumes whose |density gap|
    is within `threshold` don't participate (the reference's
    isBalancingNeeded band, GreedyPlanner.java:73); participating
    volumes shed/fill to exactly floor(ideal). Deterministic interval
    order: bytes desc, volume name asc — the reference also drains the
    fullest disk first."""
    d = volume_density(volumes)
    over = d.filter(
        (F.col("used") > F.col("ideal_bytes"))
        & (-F.col("density_gap") > threshold)
    ).select(
        "node", "volume", (F.col("used") - F.col("ideal_bytes")).alias("amt")
    )
    under = d.filter(
        (F.col("used") < F.col("ideal_bytes"))
        & (F.col("density_gap") > threshold)
    ).select(
        "node", "volume", (F.col("ideal_bytes") - F.col("used")).alias("amt")
    )
    w = Window.partitionBy("node").orderBy(
        F.col("amt").desc(), F.col("volume")
    ).rowsBetween(Window.unboundedPreceding, -1)
    stack = lambda df: df.select(  # noqa: E731
        "node",
        "volume",
        F.coalesce(F.sum("amt").over(w), F.lit(0)).alias("lo"),
        (F.coalesce(F.sum("amt").over(w), F.lit(0)) + F.col("amt")).alias("hi"),
    )
    o = stack(over).select(
        "node", F.col("volume").alias("src_volume"),
        F.col("lo").alias("olo"), F.col("hi").alias("ohi"),
    )
    u = stack(under).select(
        F.col("node").alias("__un"), F.col("volume").alias("dst_volume"),
        F.col("lo").alias("ulo"), F.col("hi").alias("uhi"),
    )
    return (
        o.join(
            u,
            (F.col("node") == F.col("__un"))
            & (F.col("olo") < F.col("uhi"))
            & (F.col("ulo") < F.col("ohi")),
        )
        .select(
            "node",
            "src_volume",
            "dst_volume",
            (F.least("ohi", "uhi") - F.greatest("olo", "ulo")).alias(
                "move_bytes"
            ),
        )
        .filter(F.col("move_bytes") > 0)
    )
