"""YARN Federation policies: router choice + AMRMProxy ANY-split.

Pins the reference semantics of PriorityRouterPolicy /
HashBasedRouterPolicy / LoadBasedRouterPolicy and
LocalityMulticastAMRMProxyPolicy's splitIndividualAny /
computeIntegerAssignment, including the two documented deterministic
divergences (tie order, Hamilton residue)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_source_spark.functions.hashes import java_string_hash
from hadoop_source_spark.operators import yarnfed


def _py_java_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) & 0xFFFFFFFF
    return h - 0x100000000 if h >= 0x80000000 else h


def test_java_string_hash_matches_reference_fold(spark):
    vals = ["", "q", "q0", "federation.queue.7", "root.a.b.c",
            "a" * 40, "Zz09._-"]
    df = spark.createDataFrame([(v,) for v in vals], "s string").select(
        "s", java_string_hash("s").alias("h")
    )
    got = {r["s"]: r["h"] for r in df.collect()}
    for v in vals:
        assert got[v] == _py_java_hash(v), v
    # the workload queue names wrap negative — keep that property pinned
    assert _py_java_hash("federation.queue.0") < 0


def _subclusters(spark):
    return spark.createDataFrame(
        [
            ("sc0", True, 100), ("sc1", True, 500), ("sc2", True, 500),
            ("sc3", False, 900), ("sc4", True, 50),
        ],
        "sc_id string, active boolean, available_mb long",
    )


def _weights(spark):
    return spark.createDataFrame(
        [("sc0", 0.5), ("sc1", 1.0), ("sc2", 1.0), ("sc3", 1.0),
         ("sc4", 0.0)],
        "sc_id string, weight double",
    )


def test_route_apps_policies(spark):
    apps = spark.createDataFrame(
        [
            (1, "qa", []),            # no blacklist
            (2, "qa", ["sc1"]),       # blacklists the tie-winner
            (3, "qa", ["sc1", "sc2"]),  # blacklists all weight-1 RMs
        ],
        "app_id long, queue string, blacklist array<string>",
    )
    out = {
        r["app_id"]: r
        for r in yarnfed.route_apps(apps, _subclusters(spark),
                                    _weights(spark)).collect()
    }
    # priority: sc1/sc2 tie at 1.0 -> smallest id; inactive sc3 never
    assert out[1]["home_priority"] == "sc1"
    assert out[2]["home_priority"] == "sc2"
    # both weight-1 RMs blacklisted -> falls to the 0.5 tier (sc0)
    assert out[3]["home_priority"] == "sc0"
    # load: weight must be EXACTLY 1 (0.5 never wins on memory);
    # availableMB tie between sc1/sc2 -> smallest id
    assert out[1]["home_load"] == "sc1"
    assert out[2]["home_load"] == "sc2"
    assert out[3]["home_load"] is None  # reference throws; batch -> NULL
    # hash: weights ignored, actives minus blacklist, sorted order
    h = abs(_py_java_hash("qa"))
    active_sorted = ["sc0", "sc1", "sc2", "sc4"]
    assert out[1]["home_hash"] == active_sorted[h % 4]
    minus1 = ["sc0", "sc2", "sc4"]
    assert out[2]["home_hash"] == minus1[h % 3]
    minus12 = ["sc0", "sc4"]
    assert out[3]["home_hash"] == minus12[h % 2]


def test_route_apps_zero_and_negative_weights_never_home(spark):
    # only a zero-weight and a negative-weight subcluster are active:
    # priority/load find no home (Float.MIN_VALUE floor / 0-1 gate),
    # hash still routes (it ignores weights)
    sc = spark.createDataFrame(
        [("sc0", True, 10), ("sc1", True, 99)],
        "sc_id string, active boolean, available_mb long",
    )
    w = spark.createDataFrame(
        [("sc0", 0.0), ("sc1", -3.0)], "sc_id string, weight double"
    )
    apps = spark.createDataFrame(
        [(1, "qa", [])], "app_id long, queue string, blacklist array<string>"
    )
    row = yarnfed.route_apps(apps, sc, w).collect()[0]
    assert row["home_priority"] is None
    assert row["home_load"] is None
    assert row["home_hash"] in ("sc0", "sc1")


def _split_config(spark):
    # exact-binary weights: AE = {sc0:1, sc1:2, sc2:1, sc5:4}, totW=8;
    # headroom known in AE: sc0=8192, sc2=24576 (tot 2^15, known 2 of 4)
    return spark.createDataFrame(
        [
            ("sc0", True, 1.0, 8192), ("sc1", True, 2.0, None),
            ("sc2", True, 1.0, 24576), ("sc3", True, 0.0, 4096),
            ("sc4", False, 4.0, 1024), ("sc5", True, 4.0, None),
        ],
        "sc_id string, active boolean, weight double, headroom_mb long",
    )


def test_split_any_exact_weights_and_hamilton(spark):
    # hrAlpha=0.5 -> w = sc0:0.125, sc1:0.25, sc2:0.25, sc5:0.375
    reqs = spark.createDataFrame(
        [(1, 16), (2, 10), (3, 1)], "req_id long, num_containers long"
    )
    rows = yarnfed.split_any(reqs, _split_config(spark), 0.5).collect()
    out = {(r["req_id"], r["sc_id"]): r["containers"] for r in rows}
    # 16 splits exactly: 2, 4, 4, 6 — no residue
    assert out[(1, "sc0")] == 2 and out[(1, "sc1")] == 4
    assert out[(1, "sc2")] == 4 and out[(1, "sc5")] == 6
    # 10 -> shares 1.25/2.5/2.5/3.75, floors sum 8, residue 2 goes to
    # the largest remainders: sc5 (.75) then the .5 tie -> smallest id
    assert out[(2, "sc5")] == 4 and out[(2, "sc1")] == 3
    assert out[(2, "sc2")] == 2 and out[(2, "sc0")] == 1
    # 1 container: all floors 0, residue 1 -> max remainder sc5;
    # zero bins are NOT emitted (reference only adds non-empty asks)
    assert out[(3, "sc5")] == 1
    assert (3, "sc0") not in out and (3, "sc1") not in out
    # invariant from the reference javadoc: per-RM asks add up to the
    # user ask (Hamilton makes the "small excess" exactly zero)
    sums = {}
    for (rid, _), c in out.items():
        sums[rid] = sums.get(rid, 0) + c
    assert sums == {1: 16, 2: 10, 3: 1}


def test_split_any_zero_cancel_fans_to_headroom_keyset(spark):
    # a 0-container ANY forwards to every RM we hold headroom state
    # for — INCLUDING disabled (sc3, weight 0) and inactive (sc4) ones
    reqs = spark.createDataFrame([(9, 0)], "req_id long, num_containers long")
    rows = yarnfed.split_any(reqs, _split_config(spark), 0.5).collect()
    assert {(r["sc_id"], r["containers"]) for r in rows} == {
        ("sc0", 0), ("sc2", 0), ("sc3", 0), ("sc4", 0)
    }


def test_split_any_headroom_alpha_extremes(spark):
    reqs = spark.createDataFrame([(1, 8)], "req_id long, num_containers long")
    # alpha=0: pure policy weights 1:2:1:4 over totW 8
    out0 = {
        r["sc_id"]: r["containers"]
        for r in yarnfed.split_any(reqs, _split_config(spark), 0.0).collect()
    }
    assert out0 == {"sc0": 1, "sc1": 2, "sc2": 1, "sc5": 4}
    # alpha=1: pure headroom — known RMs get (hr/totHr)*(2/4), unknown 1/4
    # -> sc0:0.125, sc2:0.375, sc1/sc5:0.25 -> of 8: 1, 3, 2, 2
    out1 = {
        r["sc_id"]: r["containers"]
        for r in yarnfed.split_any(reqs, _split_config(spark), 1.0).collect()
    }
    assert out1 == {"sc0": 1, "sc2": 3, "sc1": 2, "sc5": 2}


def test_split_any_plan_broadcasts_subclusters(spark):
    reqs = spark.createDataFrame(
        [(i, i % 20 + 1) for i in range(50)],
        "req_id long, num_containers long",
    )
    plan = yarnfed.split_any(
        reqs, _split_config(spark), 0.5
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
