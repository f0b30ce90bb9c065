"""Replica read-path ordering: network distance + liveness sort.

Reference semantics:
- `common/net/NetworkTopology.java:758` (`getWeight`): reading from a
  replica costs 0 on the same node, 2 on the same rack, and +2 for
  every level the paths diverge — in a /dc/rack/node topology that is
  0 / 2 / 4 (same dc) / 6 (cross-dc), exactly `getDistanceByPath`
  (:369).
- `hdfs/server/blockmanagement/DatanodeManager.java:551`
  (`sortLocatedBlock`): before the distance sort, decommissioned —
  and, with read.considerStale, stale — replicas are moved to the
  bottom so clients prefer healthy copies; the distance sort then
  runs over the active prefix only.
- ties inside one distance class are shuffled for load spreading
  (`NetworkTopology.sortByDistance:906`); here the spread is a
  DETERMINISTIC arithmetic mixing key over (block, client, node) so
  the oracle can reproduce it, with the same statistical effect.

Spark-first: one projection computes the weight per (block, client,
replica) and a window PARTITIONED BY (block, client) ranks replicas —
replica-count-sized frames, partition-parallel at any block count.
No topology tree is ever walked: the /dc/rack/node levels are columns
and the while-loops above collapse to a CASE over column equality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def _mk() -> Column:
    """Deterministic tie spread within a weight class (plain bigint
    arithmetic — reproducible by any engine, no hash builtin)."""
    return (
        F.col("block_id") * 1000003
        + F.col("client_id") * 7919
        + F.col("node_id") * 104729
    ) % 999983


def replica_weight(
    joined: DataFrame,
    reader_prefix: str = "c_",
) -> DataFrame:
    """Weight column for rows carrying replica (node, rack, dc) and
    reader (c_node, c_rack, c_dc) columns: 0 same node, 2 same rack,
    4 same dc, 6 cross-dc (NetworkTopology.getDistanceByPath for
    3-level paths)."""
    p = reader_prefix
    return joined.withColumn(
        "weight",
        F.when(F.col("node") == F.col(p + "node"), F.lit(0))
        .when(F.col("rack") == F.col(p + "rack"), F.lit(2))
        .when(F.col("dc") == F.col(p + "dc"), F.lit(4))
        .otherwise(F.lit(6)),
    )


def sort_located_blocks(
    replicas: DataFrame,
    clients: DataFrame,
    consider_stale: bool = True,
) -> DataFrame:
    """Read order for every (block, client) pair.

    replicas: block_id, node, node_id (bigint — feeds the
    deterministic spread key), rack, dc, decommissioned (bool),
    stale (bool). clients: client_id, c_node, c_rack, c_dc
    (metadata-sized — broadcast). Output adds weight and position
    (1 = read first): decommissioned always last, stale next-to-last
    when consider_stale (DatanodeManager's comparator), then weight
    ascending, deterministic mixing-key spread inside a class."""
    j = replica_weight(replicas.crossJoin(F.broadcast(clients)))
    liveness = F.when(F.col("decommissioned"), F.lit(2)).otherwise(
        F.when(F.col("stale") & F.lit(consider_stale), F.lit(1)).otherwise(
            F.lit(0)
        )
    )
    w = Window.partitionBy("block_id", "client_id").orderBy(
        liveness.asc(), F.col("weight").asc(), _mk().asc(), F.col("node").asc()
    )
    return j.select(
        "block_id",
        "client_id",
        "node",
        "rack",
        "dc",
        "decommissioned",
        "stale",
        "weight",
        F.row_number().over(w).alias("position"),
    )


def hedged_read_eta(
    ordered: DataFrame,
    threshold_ms: float,
    latency_col: str = "latency_ms",
) -> DataFrame:
    """Hedged-read planning over an already-sorted replica list
    (reference `hdfs-client/impl/DfsClientConf.java:148,264`
    `dfs.client.hedged.read.threshold.millis`; DFSInputStream's hedged
    loop starts a SECOND replica read once the first has been out that
    long and takes whichever returns first). With `ordered` =
    sort_located_blocks output plus a per-replica latency estimate:

      eta_ms       = min(l1, threshold + l2)   (l1 alone if no 2nd)
      hedged_helps = the hedge, not the primary, would win

    One groupBy per (block, client) with min_by picks — the same
    partition key the ordering window already used, so Catalyst reuses
    the exchange."""
    l1 = F.min_by(F.col(latency_col), F.col("position"))
    picks = ordered.groupBy("block_id", "client_id").agg(
        F.min_by("node", "position").alias("primary_node"),
        l1.alias("__l1"),
        F.min_by(
            F.when(F.col("position") >= 2, F.col(latency_col)),
            F.when(F.col("position") >= 2, F.col("position")),
        ).alias("__l2"),
    )
    eta = F.when(
        F.col("__l2").isNotNull(),
        F.least(F.col("__l1"), F.col("__l2") + threshold_ms),
    ).otherwise(F.col("__l1"))
    return picks.select(
        "block_id",
        "client_id",
        "primary_node",
        F.round(F.col("__l1"), 4).alias("primary_ms"),
        F.round(eta, 4).alias("eta_ms"),
        F.coalesce(
            F.col("__l2") + threshold_ms < F.col("__l1"), F.lit(False)
        ).alias("hedged_helps"),
    )
