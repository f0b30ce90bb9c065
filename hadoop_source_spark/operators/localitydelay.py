"""CapacityScheduler delay scheduling: the NODE_LOCAL → RACK_LOCAL →
OFF_SWITCH relaxation ladder.

Reference semantics (`scheduler/capacity/allocator/
RegularContainerAllocator.java`):
- `canAssign:302-365` — NODE_LOCAL needs an outstanding ask on THIS
  node (and, by fall-through order, on this rack); RACK_LOCAL needs a
  rack ask and `min(clusterNodes, nodeLocalityDelay) <
  missedOpportunities`; OFF_SWITCH is immediate for a reserved
  container, impossible on an empty cluster, immediate when the key
  has only ANY asks (uniqLocationAsks == 1), and otherwise delayed by
  either `missed > min(N, nodeLocalityDelay +
  rackLocalityAdditionalDelay)` (when the additional-delay knob
  > -1) or the wait-factor rule `min(N, outstandingAsks *
  localityWaitFactor) < missed`.
- `getLocalityWaitFactor:282-289` — `min(max(uniqAsks-1, 0) /
  clusterNodes, 1)`.
- `assignContainersOnNode:370-415` — the ladder itself: try node-
  local, then rack-local, then off-switch, each gated by a positive
  pending ask AND canAssign; a node passing none is skipped
  (NODE_SKIPPED_BECAUSE_OF_OFF_SWITCH_DELAY when the off-switch gate
  was the one that held).

This operator classifies heartbeat-granularity scheduling snapshots —
(app, schedulerKey, node, missed-opportunity count, pending-ask
shape) — into the level the allocator would hand out. It is a pure
cascading-when over one scan: zero joins, zero shuffles, whole-stage
codegen end to end; the queue-config knobs arrive as literal columns.
The schedulingOpportunities COUNTER evolution (add on try, subtract
on PRIORITY_SKIPPED, `:265-277`) is upstream state, not re-modeled
here: snapshots carry the counter value.

Float note: the reference computes the wait factor in float32; this
engine and its oracle both use float64. The decision only differs
where `asks*(uniq-1)/N` straddles `missed` inside one float32 ulp —
irrelevant for integer-valued inputs of this size, and the
engine/oracle pair stays bit-identical by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def classify(
    snapshots: DataFrame,
    cluster_nodes: int,
) -> DataFrame:
    """Decide the allocation level for every scheduling snapshot.

    `snapshots` columns: app_id, sched_key, node, rack, missed (long),
    node_ask / rack_ask / total_ask (long pending-ask counts),
    uniq_asks (int, getUniqueLocationAsks), reserved (boolean),
    node_delay (int, queue nodeLocalityDelay), rack_add_delay (int,
    queue rackLocalityAdditionalDelay; -1 disables). Returns the
    input keys + decision in NODE_LOCAL / RACK_LOCAL / OFF_SWITCH /
    SKIP."""
    n = F.lit(cluster_nodes)
    missed = F.col("missed")
    # canAssign(NODE_LOCAL): rack-ask precondition, then node ask
    node_ok = (
        (F.col("node_ask") > 0)
        & (F.col("rack_ask") > 0)
    )
    # canAssign(RACK_LOCAL): min(N, nodeLocalityDelay) < missed
    rack_ok = (F.col("rack_ask") > 0) & (
        F.least(n, F.col("node_delay")) < missed
    )
    # canAssign(OFF_SWITCH)
    wait_factor = F.least(
        (F.greatest(F.col("uniq_asks") - 1, F.lit(0)).cast("double")) / n,
        F.lit(1.0),
    )
    off_ok = F.when(F.col("reserved"), F.lit(True)).otherwise(
        F.when(F.lit(cluster_nodes == 0), F.lit(False)).otherwise(
            F.when(F.col("uniq_asks") == 1, F.lit(True)).otherwise(
                F.when(
                    F.col("rack_add_delay") > -1,
                    missed
                    > F.least(
                        n, F.col("node_delay") + F.col("rack_add_delay")
                    ),
                ).otherwise(
                    F.least(
                        n.cast("double"),
                        F.col("total_ask").cast("double") * wait_factor,
                    )
                    < missed.cast("double")
                )
            )
        )
    )
    decision = (
        F.when((F.col("node_ask") > 0) & node_ok, F.lit("NODE_LOCAL"))
        .when((F.col("rack_ask") > 0) & rack_ok, F.lit("RACK_LOCAL"))
        .when((F.col("total_ask") > 0) & off_ok, F.lit("OFF_SWITCH"))
        .otherwise(F.lit("SKIP"))
    )
    return snapshots.select(
        "app_id", "sched_key", "node", "missed", decision.alias("decision")
    )
