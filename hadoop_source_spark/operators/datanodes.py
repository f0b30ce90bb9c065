"""DataNode lifecycle admin: heartbeat liveness, decommission progress,
and the safe-mode block-threshold gate.

Reference semantics:
- `hdfs/server/blockmanagement/DatanodeManager.java`: a node is STALE
  once `now - lastContact` passes the stale interval
  (`DFS_NAMENODE_STALE_DATANODE_INTERVAL_DEFAULT` 30 s, :1218
  isStale) and DEAD past `2 * heartbeatRecheckInterval + 10 *
  heartbeatIntervalMs` (:1712 isDatanodeDead, ≈ 630 s with defaults).
  Intervals are parameters here — the fixture feeds day-scale
  heartbeats, so the driver query passes day-scale cutoffs.
- `DatanodeAdminManager.java` (:700 check): a DECOMMISSION_INPROGRESS
  node flips to DECOMMISSIONED only when no block remains whose ONLY
  live replica sits on it (everything it holds is sufficiently
  replicated elsewhere); until then the pending-block count is the
  admin progress metric.
- `BlockManagerSafeMode.java` (:180 areThresholdsMet): the NameNode
  stays in safe mode until `blocks with ≥ minReplication live replicas
  / total blocks ≥ threshold` (default 0.999f) AND live datanodes ≥
  `datanodeThreshold` (default 0).

Spark-first: liveness is a pure projection over the node-sized
registry; decommission progress is one explode+groupBy over the
single-replica slice of the block report (live==1 rows only — the
explode emits exactly one node per such block, so the shuffle is
bounded by the under-replicated population, not the corpus); safe mode
is two scalar partial aggs crossed into one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def liveness(
    nodes: DataFrame,
    stale_s: float = 30.0,
    dead_s: float = 630.0,
) -> DataFrame:
    """Heartbeat classification. Input: node, node_id, last_contact
    (timestamp), probe_ts (timestamp — "now"). Adds age_s + state
    (LIVE / STALE / DEAD). DEAD implies stale, so the dead check wins
    first, as isDatanodeDead does."""
    age = (
        F.unix_timestamp("probe_ts") - F.unix_timestamp("last_contact")
    ).cast("double")
    return nodes.withColumn("age_s", age).withColumn(
        "state",
        F.when(F.col("age_s") > dead_s, F.lit("DEAD"))
        .when(F.col("age_s") > stale_s, F.lit("STALE"))
        .otherwise(F.lit("LIVE")),
    )


def decommission_progress(
    nodes: DataFrame, blocks: DataFrame
) -> DataFrame:
    """Admin-state resolution. `nodes` carries a boolean
    `decommissioning`; `blocks` is the replqueue-shaped report
    (block_id, live, held_ids). pending = blocks whose only live
    replica is on the node; DECOMMISSIONED iff pending == 0
    (DatanodeAdminManager.check's all-sufficiently-replicated exit),
    else DECOMMISSION_INPROGRESS; non-admin nodes are IN_SERVICE."""
    sole = (
        blocks.filter(F.col("live") == 1)
        .select(F.explode("held_ids").alias("node_id"))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("pending_blocks"))
    )
    joined = nodes.join(F.broadcast(sole), "node_id", "left").withColumn(
        "pending_blocks", F.coalesce("pending_blocks", F.lit(0))
    )
    return joined.withColumn(
        "admin_state",
        F.when(~F.col("decommissioning"), F.lit("IN_SERVICE"))
        .when(F.col("pending_blocks") == 0, F.lit("DECOMMISSIONED"))
        .otherwise(F.lit("DECOMMISSION_INPROGRESS")),
    )


def safemode_status(
    blocks: DataFrame,
    live_nodes: DataFrame,
    threshold: float = 0.999,
    min_replication: int = 1,
    datanode_threshold: int = 0,
) -> DataFrame:
    """One-row safe-mode report: block-threshold ratio, the block
    deficit to leave (`blockSafe` vs `blockThreshold = threshold *
    blockTotal`, BlockManagerSafeMode.areThresholdsMet), the datanode
    gate, and the combined in_safemode verdict. `live_nodes` is a
    ONE-ROW frame with a `live_datanodes` column (crossJoined, never
    collected — the whole report stays one plan)."""
    agg = blocks.agg(
        F.count(F.lit(1)).alias("total_blocks"),
        F.count(F.when(F.col("live") >= min_replication, 1)).alias(
            "safe_blocks"
        ),
    )
    ratio = F.col("safe_blocks") / F.col("total_blocks")
    need = F.ceil(F.lit(threshold) * F.col("total_blocks")) - F.col(
        "safe_blocks"
    )
    return agg.crossJoin(F.broadcast(live_nodes)).select(
        "total_blocks",
        "safe_blocks",
        F.round(ratio, 6).alias("safe_ratio"),
        F.lit(threshold).alias("threshold"),
        F.greatest(need, F.lit(0)).alias("blocks_needed_to_leave"),
        "live_datanodes",
        (
            (ratio < F.lit(threshold))
            | (F.col("live_datanodes") < F.lit(datanode_threshold))
        ).alias("in_safemode"),
    )


def slow_peer_outliers(
    reports: DataFrame,
    min_nodes: int = 10,
    low_threshold_ms: float = 5.0,
) -> DataFrame:
    """Slow-peer detection by median absolute deviation (reference
    `hdfs/server/blockmanagement/SlowPeerTracker.java` collects
    peer-latency reports per reported node; `hdfs/server/datanode/
    metrics/OutlierDetector.java:110` getOutliers — a node is slow
    when its aggregate latency exceeds
    ``max(lowThresholdMs, median * 3, median + 3 * MAD)`` with
    ``MAD = 1.4826 * median(|x - median|)`` (:68 MAD_MULTIPLIER,
    :80 DEVIATION_MULTIPLIER, :88 MEDIAN_MULTIPLIER), and detection
    is skipped entirely below ``minNumResources`` nodes (:111)).

    reports: (reporting_node, reported_node, latency_ms). One groupBy
    aggregates per reported node; the median/MAD scalars are one more
    tiny agg broadcast back — two partial-agg passes, no window over
    the fleet. Emits per node: n_reports, avg_latency_ms, plus the
    fleet median/mad/threshold and is_outlier."""
    per_node = reports.groupBy(
        F.col("reported_node").alias("node")
    ).agg(
        F.count(F.lit(1)).alias("n_reports"),
        F.round(F.avg("latency_ms"), 6).alias("avg_latency_ms"),
    )
    med = per_node.agg(
        F.percentile(F.col("avg_latency_ms"), F.lit(0.5)).alias("__med"),
        F.count(F.lit(1)).alias("__n"),
    )
    mad = (
        per_node.crossJoin(F.broadcast(med))
        .agg(
            F.percentile(
                F.abs(F.col("avg_latency_ms") - F.col("__med")), F.lit(0.5)
            ).alias("__mad_raw"),
            F.first("__med").alias("__med"),
            F.first("__n").alias("__n"),
        )
        .select(
            "__med",
            "__n",
            (F.col("__mad_raw") * 1.4826).alias("__mad"),
        )
    )
    thr = F.greatest(
        F.lit(low_threshold_ms),
        F.col("__med") * 3,
        F.col("__med") + 3 * F.col("__mad"),
    )
    return per_node.crossJoin(F.broadcast(mad)).select(
        "node",
        "n_reports",
        "avg_latency_ms",
        F.round("__med", 6).alias("median_ms"),
        F.round("__mad", 6).alias("mad_ms"),
        F.round(thr, 6).alias("threshold_ms"),
        (
            (F.col("__n") >= min_nodes)
            & (F.col("avg_latency_ms") > thr)
        ).alias("is_outlier"),
    )


def block_report_diff(expected: DataFrame, reported: DataFrame) -> DataFrame:
    """Full block-report reconciliation (reference `hdfs/server/
    blockmanagement/BlockManager.java:3075` reportDiffSorted — the
    NameNode merges a datanode's sorted report against its own view
    and buckets every block):

      TO_INVALIDATE — reported but unknown to the NN (:3079,:3124 —
                      the DN should delete it)
      TO_REMOVE     — in the NN's view for this node but absent from
                      the report (the replica is gone; redundancy
                      accounting updates)
      TO_CORRUPT    — present on both sides with a generation-stamp or
                      length mismatch (:3080, markBlockAsCorrupt)
      TO_UC         — reported in an under-construction state (:3081)
      TO_ADD        — matching but not yet recorded for the storage
      OK            — matching and already recorded

    expected: node, block_id, genstamp, num_bytes, recorded (bool).
    reported: node, block_id, genstamp, num_bytes, state ('FINALIZED'
    | 'RBW' | 'RWR' | ...). The reference walks two sorted iterators
    per node; here it is ONE full-outer equi-join on (node, block_id)
    hash-partitioned across the fleet — every node's report diffs in
    parallel, and the sort the reference needs is what the shuffle
    already provides."""
    e = expected.select(
        "node", "block_id",
        F.col("genstamp").alias("e_gs"),
        F.col("num_bytes").alias("e_len"),
        "recorded",
    )
    r = reported.select(
        "node", "block_id",
        F.col("genstamp").alias("r_gs"),
        F.col("num_bytes").alias("r_len"),
        "state",
    )
    j = e.join(r, ["node", "block_id"], "full_outer")
    action = (
        F.when(F.col("e_gs").isNull(), F.lit("TO_INVALIDATE"))
        .when(F.col("r_gs").isNull(), F.lit("TO_REMOVE"))
        .when(F.col("state") != "FINALIZED", F.lit("TO_UC"))
        .when(
            (F.col("e_gs") != F.col("r_gs"))
            | (F.col("e_len") != F.col("r_len")),
            F.lit("TO_CORRUPT"),
        )
        .when(~F.coalesce("recorded", F.lit(False)), F.lit("TO_ADD"))
        .otherwise(F.lit("OK"))
    )
    return j.select("node", "block_id", action.alias("action"))


def maintenance_readiness(
    replicas: DataFrame,
    entering: DataFrame,
    min_maintenance_repl: int = 1,
) -> DataFrame:
    """Maintenance-entry gate (reference `hdfs/server/blockmanagement/
    DatanodeAdminManager.java:67` — a node moves ENTERING_MAINTENANCE →
    IN_MAINTENANCE only once every block it holds keeps at least
    `dfs.namenode.maintenance.replication.min` live replicas on nodes
    NOT going into maintenance; `isSufficient` :311 is the per-block
    check). replicas: block_id, node, live (bool). entering: node.
    Output per entering node: n_blocks, n_blocking (blocks that would
    drop below the floor), ready.

    Shape: one broadcast semi/anti classification of the replica table
    + a block-keyed partial agg + one join back — no per-node loop,
    the whole fleet gates in one pass."""
    ent = F.broadcast(entering.select(F.col("node").alias("__m")))
    marked = replicas.join(
        ent, replicas["node"] == F.col("__m"), "left"
    ).withColumn("__entering", F.col("__m").isNotNull())
    outside = (
        marked.filter(F.col("live") & ~F.col("__entering"))
        .groupBy("block_id")
        .agg(F.count(F.lit(1)).alias("__outside"))
    )
    on_entering = marked.filter(F.col("__entering")).select(
        "block_id", "node"
    )
    checked = on_entering.join(outside, "block_id", "left").withColumn(
        "__blocked",
        F.coalesce("__outside", F.lit(0)) < min_maintenance_repl,
    )
    return checked.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.col("__blocked").cast("long")).alias("n_blocking"),
        (F.sum(F.col("__blocked").cast("long")) == 0).alias("ready"),
    )
