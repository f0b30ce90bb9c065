"""DecayRpcScheduler / FairCallQueue and datanode-admin semantics pins
vs hand-applied reference rules (DecayRpcScheduler.computePriorityLevel,
DatanodeManager.isStale/isDatanodeDead, DatanodeAdminManager.check,
BlockManagerSafeMode.areThresholdsMet)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hadoop_source_spark.operators import datanodes as dn
from hadoop_source_spark.operators import rpcsched as rs


def _calls(spark, rows):
    return spark.createDataFrame(
        rows, "caller string, ts timestamp, cost double, resp_ms double"
    )


def _d(day, h=12):
    return dt.datetime(2024, 1, day, h)


def test_decay_closed_form_matches_sweep_loop(spark):
    # probe day = Jan 10. a call N days back survives with weight 0.5^N —
    # exactly what N sweep passes of count *= 0.5 leave behind.
    rows = [
        ("a", _d(10), 1.0, 8.0),   # today: weight 1
        ("a", _d(9), 1.0, 8.0),    # 1 sweep: 0.5
        ("a", _d(7), 1.0, 8.0),    # 3 sweeps: 0.125
        ("b", _d(10), 2.0, 4.0),   # cost-weighted (WeightedTimeCostProvider)
    ]
    out = {
        r.caller: r
        for r in rs.decayed_caller_state(_calls(spark, rows)).collect()
    }
    assert out["a"].decayed_cost == pytest.approx(1 + 0.5 + 0.125)
    assert out["b"].decayed_cost == pytest.approx(2.0)
    # decayed avg resp for a: all resp 8 → 8 regardless of weights
    assert out["a"].decayed_resp_sum / out["a"].decayed_resp_weight == (
        pytest.approx(8.0)
    )


def test_priority_thresholds_are_strict_less_than(spark):
    # shares engineered at 0.0625 / exactly 0.125 / 0.3125 / 0.5: the
    # reference keeps a caller at level i only while share < threshold,
    # so exactly-0.125 falls to level 1 and exactly-0.5 to level 3.
    rows = [
        ("t", _d(10), 1.0, 0.0),
        ("e", _d(10), 2.0, 0.0),
        ("m", _d(10), 5.0, 0.0),
        ("h", _d(10), 8.0, 0.0),
    ]
    pr = {
        r.caller: r.priority
        for r in rs.assign_priorities(
            rs.decayed_caller_state(_calls(spark, rows))
        ).collect()
    }
    assert pr == {"t": 0, "e": 1, "m": 2, "h": 3}


def test_backoff_per_level_thresholds(spark):
    rows = [
        ("slow", _d(10), 8.0, 100.0),   # share 0.5 → level 3
        ("fast", _d(10), 1.0, 1.0),     # share 0.0625 → level 0
        ("mid", _d(10), 7.0, 30.0),     # share 0.4375 → level 2
    ]
    pr = rs.assign_priorities(rs.decayed_caller_state(_calls(spark, rows)))
    lv = {
        r.priority: r
        for r in rs.backoff_by_response_time(
            pr, (10.0, 10.0, 10.0, 99.0)
        ).collect()
    }
    assert lv[0].backoff is False      # 1.0 < 10
    assert lv[2].backoff is True       # 30 > 10
    assert lv[3].backoff is True       # 100 > 99
    assert lv[3].prio_avg_resp == pytest.approx(100.0)


def _nodes(spark, rows):
    return spark.createDataFrame(
        rows,
        "node string, node_id bigint, last_contact timestamp, "
        "probe_ts timestamp, decommissioning boolean",
    )


def test_liveness_boundaries_and_dead_precedence(spark):
    probe = _d(10)
    rows = [
        ("fresh", 0, _d(10), probe, False),                  # age 0 → LIVE
        ("edge", 1, _d(10) - dt.timedelta(seconds=30), probe, False),
        ("stale", 2, _d(10) - dt.timedelta(seconds=31), probe, False),
        ("dead", 3, _d(10) - dt.timedelta(seconds=631), probe, False),
    ]
    st = {
        r.node: r.state
        for r in dn.liveness(_nodes(spark, rows), 30.0, 630.0).collect()
    }
    # exactly-at-threshold is NOT yet stale/dead (strict >, as isStale)
    assert st == {
        "fresh": "LIVE", "edge": "LIVE", "stale": "STALE", "dead": "DEAD"
    }


def test_decommission_pending_and_completion(spark):
    probe = _d(10)
    nodes = _nodes(
        spark,
        [
            ("a", 0, probe, probe, True),    # holds sole replicas
            ("b", 1, probe, probe, True),    # nothing pending → done
            ("c", 2, probe, probe, False),   # not decommissioning
        ],
    )
    blocks = spark.createDataFrame(
        [
            (100, 1, [0]),        # sole replica on a
            (101, 1, [0]),        # sole replica on a
            (102, 2, [0, 2]),     # two replicas — never pending
            (103, 1, [2]),        # sole replica on non-admin c
        ],
        "block_id long, live long, held_ids array<bigint>",
    )
    out = {
        r.node: r for r in dn.decommission_progress(nodes, blocks).collect()
    }
    assert out["a"].admin_state == "DECOMMISSION_INPROGRESS"
    assert out["a"].pending_blocks == 2
    assert out["b"].admin_state == "DECOMMISSIONED"
    assert out["c"].admin_state == "IN_SERVICE"
    assert out["c"].pending_blocks == 1  # reported even when in service


def test_safemode_threshold_and_datanode_gate(spark):
    def blocks(lives):
        return spark.createDataFrame(
            [(i, lv) for i, lv in enumerate(lives)],
            "block_id long, live long",
        )

    live1 = spark.createDataFrame([(1,)], "live_datanodes long")
    # 7/8 safe < 0.999 → in safe mode, deficit = ceil(.999*8) - 7 = 1
    r = dn.safemode_status(blocks([0, 1, 1, 1, 1, 1, 1, 1]), live1).collect()[0]
    assert r.in_safemode and r.blocks_needed_to_leave == 1
    # all safe → ratio 1.0 ≥ threshold → leaves safe mode
    r = dn.safemode_status(blocks([1] * 8), live1).collect()[0]
    assert not r.in_safemode and r.blocks_needed_to_leave == 0
    # datanode gate alone keeps it in safe mode
    live0 = spark.createDataFrame([(0,)], "live_datanodes long")
    r = dn.safemode_status(
        blocks([1] * 8), live0, datanode_threshold=1
    ).collect()[0]
    assert r.in_safemode
