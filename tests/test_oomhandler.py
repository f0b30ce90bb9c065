"""Elastic-memory OOM handler pins (DefaultOOMHandler.java:63-105,
175-236,277-334)."""

from __future__ import annotations

from hadoop_source_spark.operators import oomhandler as oh

SCHEMA = (
    "node_id string, container_id string, running boolean,"
    " exec_type string, launch_time long, mem_usage long,"
    " memsw_usage long, request_mb long"
)


def run(spark, rows, **kw):
    out = oh.oom_kill_order(
        spark.createDataFrame(rows, SCHEMA), **kw).collect()
    return sorted(
        (r for r in out if r["verdict"] == "CANDIDATE"),
        key=lambda r: (r["node_id"], r["kill_rank"]),
    ), [r for r in out if r["verdict"] == "GIVE_UP"]


MB = 1024 * 1024


def test_kill_order_opportunistic_ool_latest_first(spark):
    rows = [
        # guaranteed, within limit, old
        ("n1", "g_old", True, "GUARANTEED", 100, 1 * MB, None, 2),
        # guaranteed, out of limit
        ("n1", "g_ool", True, "GUARANTEED", 200, 5 * MB, None, 2),
        # opportunistic, within limit, launched later than o_early
        ("n1", "o_late", True, "OPPORTUNISTIC", 900, 1 * MB, None, 2),
        ("n1", "o_early", True, "OPPORTUNISTIC", 300, 1 * MB, None, 2),
        # opportunistic AND out of limit: absolute first
        ("n1", "o_ool", True, "OPPORTUNISTIC", 50, 9 * MB, None, 2),
        # not running: never a candidate
        ("n1", "starting", False, "OPPORTUNISTIC", 999, 9 * MB, None, 2),
        # null token -> treated as guaranteed
        ("n1", "no_token", True, None, 950, 1 * MB, None, 2),
    ]
    cands, give_up = run(spark, rows)
    assert [r["container_id"] for r in cands] == [
        "o_ool", "o_late", "o_early", "g_ool", "no_token", "g_old"]
    assert not give_up
    assert cands[0]["opportunistic"] and cands[0]["out_of_limit"]


def test_virtual_enforcement_reads_memsw(spark):
    rows = [
        ("n1", "a", True, "GUARANTEED", 100, 1 * MB, 9 * MB, 2),
        ("n1", "b", True, "GUARANTEED", 200, 1 * MB, 1 * MB, 2),
    ]
    cands, _ = run(spark, rows, enforce_virtual=True)
    # a is out of limit only via memsw
    assert [r["container_id"] for r in cands] == ["a", "b"]
    assert cands[0]["out_of_limit"]
    # physical mode: neither out of limit; later launch first
    cands, _ = run(spark, rows, enforce_virtual=False)
    assert [r["container_id"] for r in cands] == ["b", "a"]


def test_unreadable_stat_counts_within_limit(spark):
    rows = [("n1", "a", True, "GUARANTEED", 100, None, None, 2)]
    cands, _ = run(spark, rows)
    assert not cands[0]["out_of_limit"]


def test_give_up_without_running_containers(spark):
    rows = [("n1", "a", False, "GUARANTEED", 100, 9 * MB, None, 2)]
    cands, give_up = run(spark, rows)
    assert not cands and [g["node_id"] for g in give_up] == ["n1"]
