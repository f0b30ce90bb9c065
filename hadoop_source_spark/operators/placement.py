"""Rack-aware replica placement planning (reference:
hdfs/server/blockmanagement/BlockPlacementPolicyDefault.java — the
default HDFS policy: 1st replica on the writer's node, 2nd on a node in a
DIFFERENT rack, 3rd on a DIFFERENT node in the SAME rack as the 2nd; at
most one replica per node and, with enough racks, at most two per rack).

The NameNode resolves this against its in-memory topology; the Spark-first
equivalent collapses the topology (thousands of rows even at 100 TB) into
ONE broadcast array row and picks each block's replicas with per-row
higher-order functions — filter + min-by-key aggregate over the array. The
physical plan is scan → project → explode: ZERO shuffles, O(nodes) work
per block exactly like the NameNode's chooseTarget loop. Where the
reference draws replicas randomly, this planner minimizes a deterministic
per-(block, node) mixing key, so plans are reproducible and SQL-checkable
while still spreading load across nodes like a seeded random choice (the
key varies per block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOPO_T = "struct<node:string,node_id:bigint,rack:string>"


def _mk(x: str) -> str:
    """Deterministic per-(block, node) spread key in plain arithmetic
    (expressible identically in any SQL engine — no engine hash):
    Knuth-style multiplicative mix mod a prime, tie-broken by node_id."""
    return (
        f"((block_id * 1000003 + {x}.node_id * 7919) % 104729) * 64"
        f" + {x}.node_id"
    )


def _pick_min(arr: str) -> str:
    """min-by-mixing-key over a candidate struct array (null if empty)."""
    return (
        f"aggregate({arr}, cast(null as {_TOPO_T}), (acc, x) -> "
        f"CASE WHEN acc IS NULL THEN x "
        f"WHEN ({_mk('x')}) < ({_mk('acc')}) THEN x ELSE acc END)"
    )


def plan_replicas(
    blocks: DataFrame,
    topology: DataFrame,
    block_col: str = "block_id",
    writer_col: str = "writer",
) -> DataFrame:
    """Three-replica placement plan per block.

    ``blocks``: (block_col, writer_col) — writer is a node name present
    in ``topology``. ``topology``: (node, node_id, rack). Returns long
    format (block_id, replica_idx 1|2|3, node, rack). Blocks whose
    writer is unknown, or clusters with a single rack, emit only the
    placeable replicas (nulls are dropped, as chooseTarget degrades)."""
    topo_row = topology.agg(
        F.collect_list(
            F.struct(
                F.col("node"),
                F.col("node_id").cast("long").alias("node_id"),
                F.col("rack"),
            )
        ).alias("__topo")
    )
    b = blocks.select(
        F.col(block_col).alias("block_id"), F.col(writer_col).alias("writer")
    ).crossJoin(F.broadcast(topo_row))
    picked = b.select(
        "block_id",
        F.expr(
            "element_at(filter(__topo, t -> t.node = writer), 1)"
        ).alias("r1"),
        F.col("__topo").alias("__topo"),
    ).select(
        "block_id",
        "r1",
        F.expr(
            _pick_min(
                "filter(__topo, t -> t.rack != r1.rack AND t.node != r1.node)"
            )
        ).alias("r2"),
        "__topo",
    ).select(
        "block_id",
        "r1",
        "r2",
        F.expr(
            _pick_min(
                "filter(__topo, t -> t.rack = r2.rack AND t.node != r2.node)"
            )
        ).alias("r3"),
    )
    return (
        picked.select(
            "block_id",
            F.explode(
                F.expr(
                    "filter(array("
                    "struct(1 as replica_idx, r1.node as node, r1.rack as rack),"
                    "struct(2 as replica_idx, r2.node as node, r2.rack as rack),"
                    "struct(3 as replica_idx, r3.node as node, r3.rack as rack)"
                    "), s -> s.node IS NOT NULL)"
                )
            ).alias("s"),
        )
        .select(
            "block_id",
            F.col("s.replica_idx").alias("replica_idx"),
            F.col("s.node").alias("node"),
            F.col("s.rack").alias("rack"),
        )
    )


def ec_policy_feasibility(topology: DataFrame, policies: DataFrame) -> DataFrame:
    """Erasure-coding policy feasibility against a topology (reference
    `hdfs/server/blockmanagement/BlockPlacementPolicyRackFaultTolerant.
    java:37` getMaxNodesPerRack — replicas clamp to cluster size; one
    rack or one unit → all together; more racks than units → one per
    rack; else evenly spread rounding UP: (total-1)/racks + 1).

    topology: (node, rack). policies: (policy, data_units, parity_units).
    Per policy: group_size, effective units actually placeable,
    max_per_rack under the reference's spread, full_group_placeable
    (enough nodes for k+m distinct datanodes — below this the policy
    enable should be refused), and rack_failures_tolerated = parity //
    max_per_rack (losing a rack loses at most max_per_rack units;
    recovery survives while total lost ≤ parity). Two scalar counts
    broadcast onto a policy-count-sized table — nothing data-sized."""
    scal = topology.agg(
        F.countDistinct("node").alias("n_nodes"),
        F.countDistinct("rack").alias("n_racks"),
    )
    p = policies.crossJoin(F.broadcast(scal))
    group = F.col("data_units") + F.col("parity_units")
    total = F.least(group, F.col("n_nodes"))
    mpr = (
        F.when((F.col("n_racks") <= 1) | (total <= 1), total)
        .when(total < F.col("n_racks"), F.lit(1))
        .otherwise(F.floor((total - 1) / F.col("n_racks")) + 1)
    )
    return p.select(
        "policy",
        "data_units",
        "parity_units",
        group.cast("int").alias("group_size"),
        "n_nodes",
        "n_racks",
        total.cast("int").alias("effective_units"),
        mpr.cast("int").alias("max_per_rack"),
        (F.col("n_nodes") >= group).alias("full_group_placeable"),
        F.floor(F.col("parity_units") / mpr).cast("int").alias(
            "rack_failures_tolerated"
        ),
    )


def verify_placement_upgrade_domain(
    replicas: DataFrame, upgrade_domain_factor: int = 3
) -> DataFrame:
    """Fleet-wide placement verification under the upgrade-domain
    policy (reference BlockPlacementPolicyDefault.java:1160-1177
    verifyBlockPlacement — minRacks = min(2, requiredReplication),
    satisfied iff distinct racks >= minRacks OR >= every rack in the
    cluster; BlockPlacementStatusDefault.java:34-56;
    BlockPlacementPolicyWithUpgradeDomain.java:138-152 +
    BlockPlacementStatusWithUpgradeDomain.java:56-109 — the
    upgrade-domain leg needs distinct upgrade domains >= the required
    replication when it fits under the factor, else >= the factor;
    additional replicas required = max of the two legs' deficits).

    `replicas`: (block_id, node, rack, upgrade_domain, replication
    int — the block's REQUIRED replication, same on every row).
    One groupBy per block behind a single shuffle + one broadcast
    scalar (cluster rack count) — the whole fsck placement sweep in
    one pass."""
    total_racks = replicas.agg(
        F.countDistinct("rack").alias("__total_racks")
    )
    g = (
        replicas.groupBy("block_id")
        .agg(
            F.count(F.lit(1)).alias("n_replicas"),
            F.countDistinct("rack").alias("n_racks"),
            F.countDistinct("upgrade_domain").alias("n_uds"),
            F.first("replication").alias("replication"),
        )
        .crossJoin(F.broadcast(total_racks))
    )
    min_racks = F.least(F.lit(2), F.col("replication"))
    rack_ok = (F.col("n_racks") >= min_racks) | (
        F.col("n_racks") >= F.col("__total_racks")
    )
    ud_ok = F.when(
        F.col("replication") <= upgrade_domain_factor,
        F.col("replication") <= F.col("n_uds"),
    ).otherwise(F.col("n_uds") >= upgrade_domain_factor)
    rack_deficit = F.when(rack_ok, F.lit(0)).otherwise(
        min_racks - F.col("n_racks")
    )
    ud_deficit = F.when(
        F.col("replication") <= upgrade_domain_factor,
        F.col("replication") - F.col("n_uds"),
    ).otherwise(F.lit(upgrade_domain_factor) - F.col("n_uds"))
    satisfied = rack_ok & ud_ok
    return g.select(
        "block_id",
        "n_replicas",
        "n_racks",
        "n_uds",
        "replication",
        rack_ok.alias("rack_ok"),
        ud_ok.alias("ud_ok"),
        satisfied.alias("satisfied"),
        F.when(satisfied, F.lit(0))
        .otherwise(F.greatest(rack_deficit, ud_deficit))
        .cast("int")
        .alias("additional_replicas_required"),
    )
