"""Opportunistic-container queue plan pins (NodeQueueLoadMonitor.java
:66-101, 269-296, 325-345): the closed-form water-fill must equal the
reference's imperative round-robin walk exactly."""

from __future__ import annotations

import pytest

from hadoop_source_spark.operators import oppcontainers

HB = (
    "node_id string, ts long, queue_len long, wait_time long, "
    "queue_cap long, decommissioning boolean"
)


def _round_robin(nodes, total):
    """The reference loop: walk the sorted list cyclically, one
    container per node per pass, skip nodes at capacity."""
    assigned = {n: 0 for n, _cap in nodes}
    cap = dict(nodes)
    left = total
    progressed = True
    while left > 0 and progressed:
        progressed = False
        for n, _c in nodes:
            if left == 0:
                break
            if assigned[n] < cap[n]:
                assigned[n] += 1
                left -= 1
                progressed = True
    return assigned


@pytest.mark.parametrize("total", [0, 1, 5, 17, 23, 100])
def test_capped_fill_matches_imperative_walk(spark, total):
    # sorted order n0..n4 (queue_len asc built into ranks), caps vary,
    # include a zero-cap (already full) node
    hbs = [
        ("n0", 10, 0, 5, 3, False),
        ("n1", 11, 1, 5, 4, False),   # cap 3
        ("n2", 12, 2, 5, 2, False),   # cap 0 (full)
        ("n3", 13, 3, 5, 11, False),  # cap 8
        ("n4", 14, 4, 5, 9, False),   # cap 5
    ]
    df = spark.createDataFrame(hbs, HB)
    out = {
        r["node_id"]: r["assigned_len"]
        for r in oppcontainers.queue_plan(df, total).collect()
    }
    ordered = [("n0", 3), ("n1", 3), ("n2", 0), ("n3", 8), ("n4", 5)]
    assert out == _round_robin(ordered, total)


def test_ranking_tie_breaks_newest_heartbeat_first(spark):
    hbs = [
        ("a", 100, 2, 7, 9, False),
        ("b", 200, 2, 7, 9, False),  # same queue_len, newer ts
        ("c", 50, 1, 7, 9, False),
    ]
    rows = oppcontainers.queue_plan(
        spark.createDataFrame(hbs, HB), 0
    ).collect()
    ranks = {r["node_id"]: r["rank_len"] for r in rows}
    assert ranks == {"c": 1, "b": 2, "a": 3}


def test_eligibility_rules(spark):
    hbs = [
        ("live", 1, 0, 10, 5, False),
        ("decom", 2, 0, 10, 5, True),    # dropped everywhere
        ("nowait", 3, 0, -1, 5, False),  # kept for LENGTH, not WAIT
    ]
    rows = oppcontainers.queue_plan(
        spark.createDataFrame(hbs, HB), 4
    ).collect()
    by = {r["node_id"]: r for r in rows}
    assert "decom" not in by
    assert by["nowait"]["rank_len"] is not None
    assert by["nowait"]["rank_wait"] is None
    assert by["nowait"]["assigned_wait"] == 0
    # wait fill splits 4 over the single eligible node
    assert by["live"]["assigned_wait"] == 4


def test_latest_heartbeat_wins(spark):
    hbs = [
        ("n", 1, 9, 9, 9, False),
        ("n", 5, 2, 3, 9, False),   # latest
        ("n", 3, 7, 7, 9, False),
    ]
    row = oppcontainers.queue_plan(
        spark.createDataFrame(hbs, HB), 0
    ).collect()[0]
    assert row["queue_len"] == 2 and row["wait_time"] == 3


def test_wait_fill_round_robin_modulo(spark):
    hbs = [(f"n{i}", i, 0, 10 * (3 - i), 1, False) for i in range(3)]
    # wait times 30, 20, 10 -> sorted n2, n1, n0; 7 containers -> 3,2,2
    rows = oppcontainers.queue_plan(
        spark.createDataFrame(hbs, HB), 7
    ).collect()
    got = {r["node_id"]: r["assigned_wait"] for r in rows}
    assert got == {"n2": 3, "n1": 2, "n0": 2}
