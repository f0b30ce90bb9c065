"""Delay-scheduling ladder pins (RegularContainerAllocator.java
canAssign:302-365, getLocalityWaitFactor:282-289)."""

from __future__ import annotations

from hadoop_source_spark.operators import localitydelay

COLS = (
    "app_id long, sched_key long, node string, rack string, missed long, "
    "node_ask long, rack_ask long, total_ask long, uniq_asks int, "
    "reserved boolean, node_delay int, rack_add_delay int"
)


def _run(spark, rows, n=80):
    df = spark.createDataFrame(rows, COLS)
    return {
        r["app_id"]: r["decision"]
        for r in localitydelay.classify(df, cluster_nodes=n).collect()
    }


def test_ladder_and_boundaries(spark):
    got = _run(spark, [
        # node ask + rack ask -> NODE_LOCAL regardless of missed
        (1, 0, "n1", "r1", 0, 1, 1, 5, 9, False, 40, -1),
        # node ask WITHOUT rack ask: precondition fails, and with no
        # rack ask the rack rung fails too; off-switch (uniq=1) wins
        (2, 0, "n1", "r1", 0, 1, 0, 5, 1, False, 40, -1),
        # rack rung boundary: min(N, delay) < missed is STRICT
        (3, 0, "n1", "r1", 40, 0, 2, 5, 9, False, 40, 99),  # 40<40 false
        (4, 0, "n1", "r1", 41, 0, 2, 5, 9, False, 40, 99),  # 40<41 true
        # delay capped by cluster size: min(80, 500)=80
        (5, 0, "n1", "r1", 81, 0, 2, 5, 9, False, 500, 99),
    ])
    assert got[1] == "NODE_LOCAL"
    assert got[2] == "OFF_SWITCH"
    assert got[3] != "RACK_LOCAL"
    assert got[4] == "RACK_LOCAL"
    assert got[5] == "RACK_LOCAL"


def test_off_switch_gates(spark):
    got = _run(spark, [
        # reserved container: immediate
        (1, 0, "n1", "r1", 0, 0, 0, 5, 9, True, 40, -1),
        # ANY-only key (uniqAsks == 1): immediate
        (2, 0, "n1", "r1", 0, 0, 0, 5, 1, False, 40, -1),
        # additional-delay path: missed > min(N, 10+20) STRICT
        (3, 0, "n1", "r1", 30, 0, 0, 5, 9, False, 10, 20),   # not >
        (4, 0, "n1", "r1", 31, 0, 0, 5, 9, False, 10, 20),   # >
        # wait-factor path: min(80, 5*((9-1)/80)) = 0.5 < missed
        (5, 0, "n1", "r1", 1, 0, 0, 5, 9, False, 40, -1),    # 0.5<1
        (6, 0, "n1", "r1", 0, 0, 0, 5, 9, False, 40, -1),    # 0.5<0 false
        # wait factor capped at 1: uniq=200 -> factor 1, 5*1=5 < 6
        (7, 0, "n1", "r1", 6, 0, 0, 5, 200, False, 40, -1),
        (8, 0, "n1", "r1", 5, 0, 0, 5, 200, False, 40, -1),  # 5<5 false
        # no pending ask at all -> SKIP even when gates pass
        (9, 0, "n1", "r1", 99, 0, 0, 0, 1, False, 40, -1),
    ])
    assert got[1] == "OFF_SWITCH"
    assert got[2] == "OFF_SWITCH"
    assert got[3] == "SKIP"
    assert got[4] == "OFF_SWITCH"
    assert got[5] == "OFF_SWITCH"
    assert got[6] == "SKIP"
    assert got[7] == "OFF_SWITCH"
    assert got[8] == "SKIP"
    assert got[9] == "SKIP"


def test_empty_cluster_blocks_off_switch(spark):
    got = _run(spark, [
        (1, 0, "n1", "r1", 99, 0, 0, 5, 1, False, 40, -1),
    ], n=0)
    assert got[1] == "SKIP"


def test_plan_is_pure_codegen(spark):
    df = spark.createDataFrame(
        [(1, 0, "n1", "r1", 0, 1, 1, 5, 9, False, 40, -1)], COLS
    )
    plan = (
        localitydelay.classify(df, 80)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
