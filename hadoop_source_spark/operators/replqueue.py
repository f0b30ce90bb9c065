"""Low-redundancy queues + replication repair work planning.

Reference semantics: the NameNode buckets every under-redundant block
into priority queues (`hdfs/server/blockmanagement/LowRedundancyBlocks.
java:72-84`: HIGHEST 0, VERY_LOW 1, LOW 2, BADLY_DISTRIBUTED 3,
WITH_CORRUPT 4; the contiguous rules at :229-256 — zero live replicas is
corrupt unless out-of-service/read-only replicas exist, one live replica
is highest, live*3 < expected is very-low, enough replicas on ONE rack is
badly-distributed) and `BlockManager.computeReconstructionWork` then asks
the placement policy for target nodes per block.

Spark-first: classification is a pure projection over the block-report
table; target choice reuses the chooseTarget trick from
`operators/placement.py` — topology collapses to ONE broadcast array row
and each block picks its targets with higher-order array functions
(filter held nodes out, sort candidates by (rack-already-used, Knuth
mixing key), slice the needed count). Zero shuffles on the block side at
any scale; the only data-sized pass is the scan itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOPO_T = "struct<node:string,node_id:bigint,rack:string>"

# same arithmetic spread key as placement._mk: engine-portable, varies
# per (block, node) so load spreads like a seeded choice.
_MK = "((block_id * 1000003 + x.node_id * 7919) % 104729) * 64 + x.node_id"


def classify_low_redundancy(blocks: DataFrame) -> DataFrame:
    """Queue assignment per block. Input columns: block_id, live,
    read_only, out_of_service, expected, held_ids (array<bigint> of
    nodes currently holding a live replica), held_racks (array<string>
    of racks those nodes sit on — repair_plan's rack-dedup sort key
    reads it from the queued rows), n_held_racks. Healthy
    blocks (enough replicas on >1 rack) are dropped — they never enter
    a queue. `needed`: replicas to add (1 for badly-distributed — the
    reference adds a cross-rack copy then deletes; 0 for corrupt —
    nothing left to copy from)."""
    pri = (
        F.when(
            F.col("live") >= F.col("expected"),
            F.when(
                (F.col("n_held_racks") == 1) & (F.col("expected") > 1), F.lit(3)
            ),
        )
        .when(
            F.col("live") == 0,
            F.when(
                (F.col("out_of_service") > 0) | (F.col("read_only") > 0),
                F.lit(0),
            ).otherwise(F.lit(4)),
        )
        .when(F.col("live") == 1, F.lit(0))
        .when(F.col("live") * 3 < F.col("expected"), F.lit(1))
        .otherwise(F.lit(2))
    )
    needed = (
        F.when(F.col("priority") == 3, F.lit(1))
        .when(F.col("priority") == 4, F.lit(0))
        .otherwise(F.col("expected") - F.col("live"))
    )
    return (
        blocks.withColumn("priority", pri)
        .filter(F.col("priority").isNotNull())
        .withColumn("needed", needed)
    )


def repair_plan(queued: DataFrame, topology: DataFrame) -> DataFrame:
    """Targets for every queued block: candidates = topology minus the
    holding nodes, ordered by (rack already used, mixing key) — unused
    racks win first, which is exactly what heals a badly-distributed
    block — sliced to `needed`. Corrupt blocks (needed=0) keep one row
    with null target for queue visibility, as fsck prints them."""
    topo_row = topology.agg(
        F.collect_list(F.struct("node", "node_id", "rack")).alias("__topo")
    )
    # Sort key precomputed ONCE per candidate (r15, §4.2-adjacent): the
    # previous comparator-lambda array_sort re-evaluated the
    # (rack-used, mixing-key) expression — including the held_racks
    # array_contains probe — on BOTH sides of EVERY comparison
    # (~2·n·log n interpreted evaluations per block; HOF lambdas don't
    # codegen). Keys are unique (the mixing key embeds node_id), so the
    # natural struct ordering on a precomputed (key, node, rack) array
    # reproduces the comparator's order exactly with n key evaluations.
    keyed = queued.crossJoin(F.broadcast(topo_row)).withColumn(
        "__targets",
        F.expr(
            "transform(slice(array_sort("
            "  transform("
            "    filter(__topo, x -> NOT array_contains(held_ids, x.node_id)),"
            "    x -> struct("
            "      CASE WHEN array_contains(held_racks, x.rack)"
            f"      THEN 1 ELSE 0 END * 100000000 + {_MK} AS k,"
            "      x.node AS node, x.rack AS rack)"
            "  )"
            "), 1, int(needed)),"
            " s -> struct(s.node AS node, s.rack AS rack))"
        ),
    )
    return keyed.select(
        "block_id", "priority", "live", "expected", "needed",
        F.posexplode_outer("__targets").alias("slot", "__t"),
    ).select(
        "block_id", "priority", "live", "expected", "needed", "slot",
        F.col("__t.node").alias("node"),
        F.col("__t.rack").alias("rack"),
    )
