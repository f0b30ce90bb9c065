"""Datanode volume choosing: available-space policy.

Reference semantics (`hdfs/server/datanode/fsdataset/
AvailableSpaceVolumeChoosingPolicy.java`): when a datanode picks a
volume for a new block replica, it first checks whether all volumes
are within `balanced-space-threshold` bytes of each other (:213 —
`mostAvailable - leastAvailable < threshold`); if so, plain
round-robin over ALL volumes. Otherwise volumes split into a
low-available set (`available <= leastAvailable + threshold`, :246)
and a high-available set (:260), and each write goes to the high set
with `balanced-space-preference-fraction` probability (default 0.75,
scaled at :161-166), round-robin within the chosen set — so emptier
disks fill faster without starving the rest.

Spark-first: the volume list is device-count-sized → ONE broadcast
row of two sorted arrays (high/low). Every block picks its volume in
a single projection: the round-robin cursor becomes `block_id mod
set_size` and the random preference draw a deterministic arithmetic
key (same distribution, oracle-reproducible — the same substitution
`operators/readpath.py` makes for the reference's tie shuffle). The
decision is against the snapshot of free space, as a PLAN: the
reference's mutable `getAvailable()` is a point-in-time read too,
one block later."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PAIR = "struct<volume:string,available:bigint>"


def choose_volumes(
    blocks: DataFrame,
    volumes: DataFrame,
    threshold: int,
    preference_pct: int = 75,
) -> DataFrame:
    """Assign every block (block_id, size) a volume. volumes:
    (volume, available). Output adds volume, tier ('BALANCED_RR' |
    'HIGH_AVAIL' | 'LOW_AVAIL')."""
    vol_row = volumes.agg(
        F.sort_array(
            F.collect_list(F.struct("volume", "available"))
        ).alias("__all"),
        F.min("available").alias("__least"),
        F.max("available").alias("__most"),
    ).select(
        "__all",
        "__least",
        (F.col("__most") - F.col("__least") < threshold).alias("__balanced"),
        F.expr(
            f"sort_array(filter(__all, v -> v.available <= __least + {threshold}))"
        ).alias("__low"),
        F.expr(
            f"sort_array(filter(__all, v -> v.available > __least + {threshold}))"
        ).alias("__high"),
    )
    b = blocks.crossJoin(F.broadcast(vol_row))
    # deterministic preference draw in [0, 100)
    draw = F.pmod(F.col("block_id") * 2654435761, F.lit(100))
    prefer_high = (draw < preference_pct) & (F.size("__high") > 0)
    tier = F.when(F.col("__balanced"), F.lit("BALANCED_RR")).otherwise(
        F.when(
            prefer_high | (F.size("__low") == 0), F.lit("HIGH_AVAIL")
        ).otherwise(F.lit("LOW_AVAIL"))
    )
    chosen_set = (
        F.when(tier == "BALANCED_RR", F.col("__all"))
        .when(tier == "HIGH_AVAIL", F.col("__high"))
        .otherwise(F.col("__low"))
    )
    pick = F.get(
        chosen_set,
        F.pmod(F.col("block_id"), F.size(chosen_set)).cast("int"),
    )
    return b.select(
        *blocks.columns,
        pick["volume"].alias("volume"),
        tier.alias("tier"),
    )
