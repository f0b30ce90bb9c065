"""Opportunistic-container queue placement: NodeQueueLoadMonitor
ranking + the round-robin capacity-gated fill, in closed form.

Reference semantics:
- `scheduler/distributed/NodeQueueLoadMonitor.java:66-101
  (LoadComparator)` — nodes order by queueLength or queueWaitTime
  ascending; ties break NEWEST heartbeat first (`o2.timestamp -
  o1.timestamp`). `compareAndIncrement:90-100` gates each placement:
  under QUEUE_LENGTH a node accepts one more container only while
  `queueLength + 1 <= queueCapacity`; under QUEUE_WAIT_TIME there is
  no threshold.
- `NodeQueueLoadMonitor.java:269-296 (updateNode)` — a node is
  tracked only when it is not DECOMMISSIONING and (its estimated
  wait time != -1 OR the comparator is QUEUE_LENGTH); updates that
  violate this REMOVE the node.
- `NodeQueueLoadMonitor.java:325-345 (selectLeastLoadedNodes)` — the
  allocator walks the sorted list cyclically, one container per node
  per pass, skipping nodes the gate rejects
  (OpportunisticContainerAllocator's node iteration).

Closed form: cyclic one-per-pass filling with per-node remaining
capacity cap_i is water-filling. With S(r) = Σ min(cap_i, r) (total
placed after r full passes), the completed-pass level is
r* = max { r : S(r) <= C }, each node gets min(cap_i, r*), and the
remainder C - S(r*) lands on the first nodes in SORTED order that
still have headroom (cap_i > r*). S is piecewise linear with
breakpoints at the distinct cap values, so r* is a MAX over per-row
candidates `cap_k + floor((C - S(cap_k)) / n_gt_k)` — extrapolation
from an earlier segment uses a steeper slope and therefore never
overshoots the true level.

Scale shape: the latest-heartbeat reduction shuffles on node_id
(data-sized, partition-parallel); every subsequent window runs on
the NODE REGISTRY — a cluster-node-count-sized table, same deliberate
single-partition class as balancer_move_plan (PLANS.md) — and the
C and r* scalars ride a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_state(heartbeats: DataFrame) -> DataFrame:
    """Latest heartbeat per node — (node_id, ts, queue_len, wait_time,
    queue_cap, decommissioning). One shuffle on node_id."""
    w = Window.partitionBy("node_id").orderBy(F.col("ts").desc())
    return (
        heartbeats.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _fill_capped(nodes: DataFrame, total: int) -> DataFrame:
    """Round-robin fill of `total` containers over `nodes` (pre-sorted
    rank in column `rank`, remaining capacity in `cap`) — returns
    node_id + assigned."""
    caps = Window.orderBy("cap")
    rows = nodes.select(
        "node_id",
        "rank",
        "cap",
        F.coalesce(
            F.sum("cap").over(
                caps.rangeBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__below"),
        F.count(F.lit(1))
        .over(caps.rangeBetween(0, Window.unboundedFollowing))
        .alias("__n_ge"),
        F.count(F.lit(1))
        .over(caps.rangeBetween(1, Window.unboundedFollowing))
        .alias("__n_gt"),
    )
    c = F.lit(total)
    s_at_cap = F.col("__below") + F.col("cap") * F.col("__n_ge")
    candidate = F.when(
        s_at_cap <= c,
        F.col("cap")
        + F.when(
            F.col("__n_gt") > 0,
            F.floor((c - s_at_cap) / F.col("__n_gt")),
        ).otherwise(F.lit(0)),
    )
    level = rows.agg(
        F.coalesce(F.max(candidate), F.lit(0)).alias("__r")
    )
    j = rows.crossJoin(F.broadcast(level))
    placed = j.agg(
        F.sum(F.least(F.col("cap"), F.col("__r"))).alias("__placed"),
        F.first("__r").alias("__r"),
    )
    return (
        j.crossJoin(F.broadcast(placed.select("__placed")))
        .withColumn(
            "__rem_rank",
            F.row_number().over(
                Window.partitionBy(F.col("cap") > F.col("__r"))
                .orderBy("rank")
            ),
        )
        .select(
            "node_id",
            (
                F.least(F.col("cap"), F.col("__r"))
                + F.when(
                    (F.col("cap") > F.col("__r"))
                    & (
                        F.col("__rem_rank")
                        <= c - F.col("__placed")
                    ),
                    1,
                ).otherwise(0)
            ).cast("long").alias("assigned"),
        )
    )


def queue_limit(
    heartbeats: DataFrame,
    sigma: float = 1.0,
    range_min: int = 1,
    range_max: int = 100,
) -> DataFrame:
    """Adaptive container-queuing limit the RM gossips to NMs
    (reference `scheduler/distributed/QueueLimitCalculator.java`).

    `Stats.update` (:46-66): over the tracked node list, mean =
    sum/n in INT division, stdev = round(sqrt(Σ(v - mean)² / n))
    with the already-truncated mean; `determineThreshold` (:95-97)
    = (int)(mean + sigma·stdev), clamped to [rangeMin, rangeMax]
    (:103-106). `createContainerQueuingLimit` (:108-120) publishes
    the threshold as maxQueueLength under QUEUE_LENGTH (wait = -1)
    and as maxQueueWaitTimeInMs under QUEUE_WAIT_TIME (length = -1).
    Tracked sets follow NodeQueueLoadMonitor.updateNode:269-296 —
    non-decommissioning nodes, and under QUEUE_WAIT_TIME only nodes
    whose estimated wait != -1.

    Returns one row per comparator: (comparator, n_nodes, mean,
    stdev, threshold, max_queue_length, max_queue_wait_ms). Two
    node-registry-sized aggregates (the truncated mean must exist
    before deviations square), scalars ride broadcasts."""
    s = latest_state(heartbeats).where(~F.col("decommissioning"))
    metrics = s.select(
        F.lit("QUEUE_LENGTH").alias("comparator"),
        F.col("queue_len").alias("v"),
    ).unionByName(
        s.where(F.col("wait_time") != -1).select(
            F.lit("QUEUE_WAIT_TIME").alias("comparator"),
            F.col("wait_time").alias("v"),
        )
    )
    means = metrics.groupBy("comparator").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.floor(F.sum("v") / F.count(F.lit(1))).cast("long").alias("mean"),
    )
    stats = (
        metrics.join(F.broadcast(means), "comparator")
        .groupBy("comparator")
        .agg(
            F.first("n_nodes").alias("n_nodes"),
            F.first("mean").alias("mean"),
            F.round(
                F.sqrt(
                    F.sum((F.col("v") - F.col("mean")) ** 2)
                    / F.first("n_nodes")
                ),
                0,
            ).cast("long").alias("stdev"),
        )
    )
    thres = F.least(
        F.lit(range_max).cast("long"),
        F.greatest(
            F.lit(range_min).cast("long"),
            F.floor(F.col("mean") + sigma * F.col("stdev")).cast("long"),
        ),
    )
    return stats.select(
        "comparator",
        "n_nodes",
        "mean",
        "stdev",
        thres.alias("threshold"),
        F.when(F.col("comparator") == "QUEUE_LENGTH", thres)
        .otherwise(F.lit(-1)).cast("long").alias("max_queue_length"),
        F.when(F.col("comparator") == "QUEUE_WAIT_TIME", thres)
        .otherwise(F.lit(-1)).cast("long").alias("max_queue_wait_ms"),
    )


def queue_plan(heartbeats: DataFrame, containers: int) -> DataFrame:
    """Per-node opportunistic placement plan for both comparators.

    `heartbeats`: (node_id, ts long, queue_len long, wait_time long
    [-1 = unknown], queue_cap long, decommissioning boolean); the
    latest heartbeat per node is the monitor state. Returns one row
    per tracked-by-either node: eligibility, rank and assigned count
    under QUEUE_LENGTH (capacity-gated) and QUEUE_WAIT_TIME
    (ungated)."""
    # node-count-sized monitor state over a corpus-sized heartbeat log;
    # consumed by both comparators' rank/fill stages and the final
    # rollup — one heartbeat reduction, not eight (r14, §5)
    s = latest_state(heartbeats).localCheckpoint(eager=False)
    live = s.where(~F.col("decommissioning"))
    # QUEUE_LENGTH: every non-decommissioning node tracks
    len_rank = Window.orderBy(
        F.col("queue_len").asc(), F.col("ts").desc()
    )
    by_len = live.select(
        "node_id",
        F.row_number().over(len_rank).alias("rank"),
        F.greatest(
            F.col("queue_cap") - F.col("queue_len"), F.lit(0)
        ).alias("cap"),
    )
    fill_len = _fill_capped(by_len, containers).withColumnRenamed(
        "assigned", "assigned_len"
    )
    # QUEUE_WAIT_TIME: wait_time == -1 removes the node; no capacity
    wait = live.where(F.col("wait_time") != -1)
    wait_rank = Window.orderBy(F.col("wait_time").asc(), F.col("ts").desc())
    n_wait = wait.agg(F.count(F.lit(1)).alias("__n"))
    fill_wait = (
        wait.select(
            "node_id", F.row_number().over(wait_rank).alias("__wrank")
        )
        .crossJoin(F.broadcast(n_wait))
        .select(
            "node_id",
            F.col("__wrank").alias("rank_wait"),
            (
                F.floor(F.lit(containers) / F.col("__n"))
                + F.when(
                    F.col("__wrank") <= F.lit(containers) % F.col("__n"), 1
                ).otherwise(0)
            ).cast("long").alias("assigned_wait"),
        )
    )
    return (
        live.select("node_id", "queue_len", "wait_time")
        .join(by_len.select("node_id", F.col("rank").alias("rank_len")),
              "node_id", "left")
        .join(fill_len, "node_id", "left")
        .join(fill_wait, "node_id", "left")
        .select(
            "node_id",
            "queue_len",
            "wait_time",
            "rank_len",
            F.coalesce("assigned_len", F.lit(0)).alias("assigned_len"),
            "rank_wait",
            F.coalesce("assigned_wait", F.lit(0)).alias("assigned_wait"),
        )
    )
