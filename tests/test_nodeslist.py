"""RM refreshNodes decision-table pins (NodesListManager.java
handleExcludeNodeList:281-367, isValidNode:500-507,
isUntrackedNode:609-619)."""

from __future__ import annotations

from hadoop_source_spark.operators import nodeslist

N_SCHEMA = "host string, state string, current_timeout int"
I_SCHEMA = "host string"
E_SCHEMA = "host string, exc_timeout int"


def _run(spark, nodes, includes, excludes, graceful, timeout=3600):
    out = nodeslist.refresh_nodes_plan(
        spark.createDataFrame(nodes, N_SCHEMA),
        spark.createDataFrame(includes, I_SCHEMA),
        spark.createDataFrame(excludes, E_SCHEMA),
        graceful=graceful,
        request_timeout=timeout,
    ).collect()
    return {r["host"]: r for r in out}


def test_graceful_matrix(spark):
    got = _run(
        spark,
        [
            ("a", "RUNNING", None),          # valid
            ("b", "DECOMMISSIONING", 100),   # valid -> recommission
            ("c", "RUNNING", None),          # excluded -> graceful decom
            ("d", "DECOMMISSIONING", 100),   # excluded, timeout differs
            ("e", "DECOMMISSIONING", 3600),  # excluded, timeout equal
            ("f", "DECOMMISSIONED", None),   # excluded, already done
            ("g", "UNHEALTHY", None),        # excluded w/ per-host timeout
        ],
        [("a",), ("b",)],
        [("c", None), ("d", None), ("e", None), ("f", None), ("g", 120)],
        graceful=True,
    )
    assert got["a"]["action"] == "NO_ACTION"
    assert got["b"]["action"] == "RECOMMISSION"
    assert got["c"]["action"] == "GRACEFUL_DECOMMISSION"
    assert got["c"]["timeout_to_use"] == 3600
    assert got["d"]["action"] == "UPDATE_DECOMMISSIONING_TIMEOUT"
    assert got["d"]["timeout_to_use"] == 3600
    assert got["e"]["action"] == "NO_ACTION"
    assert got["f"]["action"] == "NO_ACTION"
    assert got["g"]["action"] == "GRACEFUL_DECOMMISSION"
    assert got["g"]["timeout_to_use"] == 120  # per-host beats request


def test_forceful_tracked_vs_untracked(spark):
    got = _run(
        spark,
        [
            ("a", "RUNNING", None),         # excluded, tracked
            ("b", "RUNNING", None),         # not included, not excluded
            ("c", "DECOMMISSIONED", None),  # excluded, already done
            ("d", "DECOMMISSIONING", 50),   # excluded -> forceful decom
        ],
        [("z",)],  # non-empty include list that names none of them
        [("a", None), ("c", None), ("d", None)],
        graceful=False,
    )
    assert got["a"]["action"] == "DECOMMISSION"
    assert got["b"]["action"] == "SHUTDOWN_UNTRACKED"
    assert got["c"]["action"] == "NO_ACTION"
    assert got["d"]["action"] == "DECOMMISSION"
    assert all(r["timeout_to_use"] is None for r in got.values())


def test_empty_include_list_admits_all(spark):
    got = _run(
        spark,
        [("a", "RUNNING", None), ("b", "DECOMMISSIONING", 7)],
        [],
        [],
        graceful=False,
    )
    assert got["a"]["valid"] and got["a"]["action"] == "NO_ACTION"
    assert got["b"]["action"] == "RECOMMISSION"


def test_exclude_beats_include(spark):
    got = _run(
        spark,
        [("a", "RUNNING", None)],
        [("a",)],
        [("a", None)],
        graceful=True,
    )
    assert not got["a"]["valid"]
    assert got["a"]["action"] == "GRACEFUL_DECOMMISSION"


def test_null_current_timeout_update(spark):
    # Objects.equals(null, 3600) is false -> timeout update fires
    got = _run(
        spark,
        [("a", "DECOMMISSIONING", None)],
        [],
        [("a", None)],
        graceful=True,
    )
    assert got["a"]["action"] == "UPDATE_DECOMMISSIONING_TIMEOUT"
    assert got["a"]["timeout_to_use"] == 3600
