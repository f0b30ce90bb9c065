"""Low-redundancy classification + repair targets vs hand-applied
LowRedundancyBlocks.getPriorityContiguous rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_source_spark.operators import replqueue as rq


def _blocks(spark, rows):
    return spark.createDataFrame(
        rows,
        "block_id long, live long, read_only int, out_of_service int, "
        "expected int, held_ids array<bigint>, held_racks array<string>, "
        "n_held_racks int",
    )


def _topo(spark):
    return spark.range(8).select(
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("node"),
        F.col("id").alias("node_id"),
        F.concat(F.lit("r"), (F.col("id") % 4).cast("string")).alias("rack"),
    )


def test_priority_queue_rules(spark):
    rows = [
        (1, 0, 0, 0, 3, [], [], 0),            # corrupt → 4
        (2, 0, 1, 0, 3, [], [], 0),            # read-only only → 0
        (3, 0, 0, 1, 3, [], [], 0),            # out-of-service only → 0
        (4, 1, 0, 0, 3, [0], ["r0"], 1),       # one replica → 0
        (5, 2, 0, 0, 7, [0, 1], ["r0", "r1"], 2),  # 6 < 7 → very low → 1
        (6, 2, 0, 0, 3, [0, 1], ["r0", "r1"], 2),  # → low → 2
        (7, 3, 0, 0, 3, [0, 4, 1], ["r0", "r1"], 2),  # healthy → dropped
        (8, 3, 0, 0, 3, [0, 4, 1], ["r0"], 1),  # same rack → badly → 3
    ]
    out = {
        r.block_id: r
        for r in rq.classify_low_redundancy(_blocks(spark, rows)).collect()
    }
    assert 7 not in out
    assert {b: r.priority for b, r in out.items()} == {
        1: 4, 2: 0, 3: 0, 4: 0, 5: 1, 6: 2, 8: 3,
    }
    assert out[5].needed == 5 and out[8].needed == 1 and out[1].needed == 0


def test_repair_targets_avoid_held_and_prefer_new_racks(spark):
    rows = [
        (8, 3, 0, 0, 3, [0, 4, 1], ["r0"], 1),  # badly distributed on r0
        (1, 0, 0, 0, 3, [], [], 0),             # corrupt: null target row
    ]
    queued = rq.classify_low_redundancy(_blocks(spark, rows))
    plan = rq.repair_plan(queued, _topo(spark)).collect()
    by_block = {}
    for r in plan:
        by_block.setdefault(r.block_id, []).append(r)
    # badly-distributed block gets exactly 1 target, on a NEW rack,
    # never on a holding node. held_racks=[r0] covers nodes 0,4 (r0);
    # node 1 is held too but its rack r1 is open.
    t8 = by_block[8]
    assert len(t8) == 1 and t8[0].slot == 0
    assert t8[0].rack != "r0"
    assert t8[0].node not in {"n0", "n4", "n1"}
    # corrupt block keeps a visibility row with no target
    t1 = by_block[1]
    assert len(t1) == 1 and t1[0].node is None and t1[0].slot is None


def test_repair_targets_deterministic(spark):
    rows = [(i, 1, 0, 0, 3, [int(i % 8)], [f"r{i % 4}"], 1) for i in range(20)]
    queued = rq.classify_low_redundancy(_blocks(spark, rows))
    a = sorted(map(tuple, rq.repair_plan(queued, _topo(spark)).collect()))
    b = sorted(map(tuple, rq.repair_plan(queued, _topo(spark)).collect()))
    assert a == b
    # every block needs 2 targets and never reuses its holding node
    per = {}
    for t in a:
        per.setdefault(t[0], []).append(t)
    for bid, ts in per.items():
        assert len(ts) == 2
        assert all(t[6] != f"n{bid % 8}" for t in ts)


def test_repair_targets_topology_order_invariant(spark):
    """ADVICE pin: the candidate comparator is a valid total order
    (returns 0 on key equality), so the plan cannot depend on the
    arrival order of topology rows into collect_list."""
    rows = [(i, 1, 0, 0, 3, [int(i % 8)], [f"r{i % 4}"], 1) for i in range(12)]
    queued = rq.classify_low_redundancy(_blocks(spark, rows))
    a = sorted(map(tuple, rq.repair_plan(queued, _topo(spark)).collect()))
    b = sorted(
        map(
            tuple,
            rq.repair_plan(
                queued, _topo(spark).sort(F.desc("node_id"))
            ).collect(),
        )
    )
    assert a == b
