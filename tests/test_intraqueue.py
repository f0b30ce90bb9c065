"""Intra-queue ordering policy pins (FifoOrderingPolicy.java:36,
PriorityComparator.java:31, FairOrderingPolicy.java:55-127,
PriorityUtilizationQueueOrderingPolicy.java:70-180)."""

from __future__ import annotations

from hadoop_source_spark.operators import intraqueue

APP_SCHEMA = (
    "queue string, app_seq long, priority int, start_time long,"
    " used_mb long, demand_mb long"
)
Q_SCHEMA = (
    "parent string, partition string, queue string, accessible boolean,"
    " abs_capacity double, used_capacity double, abs_used_capacity double,"
    " priority int, min_res long"
)


def _apps(spark, rows):
    out = intraqueue.rank_apps(
        spark.createDataFrame(rows, APP_SCHEMA)
    ).collect()
    return {r["app_seq"]: r for r in out}


def test_fifo_priority_desc_nulls_first_then_input_order(spark):
    got = _apps(
        spark,
        [
            ("q", 1, 2, 0, 0, 10),
            ("q", 2, 5, 0, 0, 10),     # highest priority -> first...
            ("q", 3, None, 0, 0, 10),  # ...except null sorts FIRST
            ("q", 4, 5, 0, 0, 10),     # same priority: input order
        ],
    )
    fifo = {a: got[a]["fifo_rank"] for a in got}
    assert fifo == {3: 1, 2: 2, 4: 3, 1: 4}


def test_fair_ignores_priority_orders_by_usage(spark):
    got = _apps(
        spark,
        [
            ("q", 1, 9, 0, 3000, 10),  # high priority, heavy -> fair last
            ("q", 2, 0, 0, 1000, 10),
            ("q", 3, 5, 0, 2000, 10),
        ],
    )
    assert [got[a]["fair_rank"] for a in (2, 3, 1)] == [1, 2, 3]
    assert got[1]["fifo_rank"] == 1  # FIFO and Fair visibly differ


def test_fair_tie_chain_start_time_then_demand_then_input(spark):
    got = _apps(
        spark,
        [
            ("q", 1, 0, 7, 100, 10),   # later start
            ("q", 2, 0, 3, 100, 10),   # earlier start -> first
            ("q", 3, 0, 7, 100, 0),    # zero demand -> after demanded
            ("q", 4, 0, 7, 100, 10),   # full tie with 1 -> input order
        ],
    )
    assert [got[a]["fair_rank"] for a in (2, 1, 4, 3)] == [1, 2, 3, 4]


def test_size_based_weight_offsets_small_app_bias(spark):
    # magnitude = used / log2(1+demand): a big-demand app's usage is
    # discounted, so it overtakes a smaller app with tiny demand
    got = _apps(
        spark,
        [
            ("q", 1, 0, 0, 1000, 1_000_000),  # 1000/~19.9 ~= 50
            ("q", 2, 0, 0, 900, 2),           # 900/~1.58 ~= 569
            ("q", 3, 0, 0, 100, 0),           # zero demand -> +inf, last
        ],
    )
    assert [got[a]["fair_sbw_rank"] for a in (1, 2, 3)] == [1, 2, 3]
    # while the unweighted fair rank orders by raw usage
    assert [got[a]["fair_rank"] for a in (3, 2, 1)] == [1, 2, 3]


def _queues(spark, rows, respect_priority=True):
    out = intraqueue.rank_queues(
        spark.createDataFrame(rows, Q_SCHEMA), respect_priority
    ).collect()
    return {r["queue"]: r["assignment_rank"] for r in out}


def test_queue_same_priority_less_used_first(spark):
    got = _queues(
        spark,
        [
            ("p", "", "a", True, 0.3, 0.8, 0.0, 0, 100),
            ("p", "", "b", True, 0.3, 0.2, 0.0, 0, 100),
        ],
    )
    assert got == {"b": 1, "a": 2}


def test_queue_priority_wins_same_side_of_guarantee(spark):
    # both under 1.0: higher priority first; both over: same
    got = _queues(
        spark,
        [
            ("p", "", "a", True, 0.3, 0.9, 0.0, 1, 100),
            ("p", "", "b", True, 0.3, 0.2, 0.0, 3, 100),
            ("p", "", "c", True, 0.3, 1.8, 0.0, 5, 100),
            ("p", "", "d", True, 0.3, 1.2, 0.0, 2, 100),
        ],
    )
    # under tier first (b over a by priority), then over tier
    # (c over d by priority)
    assert got == {"b": 1, "a": 2, "c": 3, "d": 4}


def test_queue_under_capacity_beats_priority_across_guarantee(spark):
    got = _queues(
        spark,
        [
            ("p", "", "hi", True, 0.3, 1.4, 0.0, 9, 100),  # over, prio 9
            ("p", "", "lo", True, 0.3, 0.5, 0.0, 0, 100),  # under, prio 0
        ],
    )
    assert got == {"lo": 1, "hi": 2}


def test_queue_zero_capacity_tier_last_uses_abs_used(spark):
    got = _queues(
        spark,
        [
            ("p", "", "z1", True, 0.0, 9.9, 0.7, 0, 100),  # zero-cap tier
            ("p", "", "z2", True, 0.0, 9.9, 0.2, 0, 100),  # lower absUsed
            ("p", "", "c1", True, 0.2, 1.9, 0.0, 0, 100),  # configured
        ],
    )
    assert got == {"c1": 1, "z2": 2, "z1": 3}


def test_queue_partition_access_and_default_open_to_all(spark):
    rows = [
        ("p", "gpu", "no", False, 0.3, 0.1, 0.0, 0, 100),
        ("p", "gpu", "yes", True, 0.3, 0.9, 0.0, 0, 100),
        ("p", "", "no2", False, 0.3, 0.1, 0.0, 0, 100),
        ("p", "", "yes2", True, 0.3, 0.9, 0.0, 0, 100),
    ]
    got = _queues(spark, rows)
    assert got["yes"] == 1 and got["no"] == 2      # accessibility first
    assert got["no2"] == 1 and got["yes2"] == 2    # default: usage only


def test_queue_tiebreak_min_res_then_abs_capacity(spark):
    got = _queues(
        spark,
        [
            ("p", "", "a", True, 0.2, 0.5, 0.0, 0, 100),
            ("p", "", "b", True, 0.2, 0.5, 0.0, 0, 900),  # bigger min
            ("p", "", "c", True, 0.4, 0.5, 0.0, 0, None), # unset min:
            ("p", "", "d", True, 0.3, 0.5, 0.0, 0, None), # abs cap desc
        ],
    )
    assert got == {"b": 1, "a": 2, "c": 3, "d": 4}


def test_queue_respect_priority_false_flattens(spark):
    rows = [
        ("p", "", "a", True, 0.3, 0.9, 0.0, 9, 100),
        ("p", "", "b", True, 0.3, 0.2, 0.0, 0, 100),
    ]
    assert _queues(spark, rows, respect_priority=False) == {"b": 1, "a": 2}
    assert _queues(spark, rows, respect_priority=True) == {"a": 1, "b": 2}
