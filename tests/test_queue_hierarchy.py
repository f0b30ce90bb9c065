"""Queue-hierarchy capacity pins (CSQueueUtils.java:62-170,
ParentQueue.java:195-236)."""

from __future__ import annotations

from hadoop_source_spark.operators import capacity as cap_ops

SCHEMA = (
    "queue_path string, label string, capacity double,"
    " max_capacity double"
)


def _run(spark, rows):
    out = cap_ops.resolve_hierarchy(
        spark.createDataFrame(rows, SCHEMA)
    ).collect()
    return {(r["queue_path"], r["label"]): r for r in out}


def test_absolute_is_path_product(spark):
    got = _run(
        spark,
        [
            ("root", "", 100.0, 100.0),
            ("root.a", "", 40.0, 80.0),
            ("root.a.x", "", 25.0, 50.0),
        ],
    )
    assert got[("root.a.x", "")]["abs_capacity"] == 0.1      # .4 * .25
    assert got[("root.a.x", "")]["abs_max_capacity"] == 0.4  # .8 * .5
    assert got[("root.a.x", "")]["verdict"] == "OK"
    assert got[("root", "")]["abs_capacity"] == 1.0


def test_zero_capacity_gates_absolute(spark):
    # capacity 0 leaves the absolute at 0, for the queue AND below
    got = _run(
        spark,
        [
            ("root", "", 100.0, 100.0),
            ("root.z", "", 0.0, 100.0),
            ("root.z.q", "", 0.0, 100.0),
        ],
    )
    assert got[("root.z", "")]["abs_capacity"] == 0.0
    assert got[("root.z.q", "")]["abs_capacity"] == 0.0
    # zero-capacity parent with zero children is legal
    assert got[("root.z", "")]["verdict"] == "OK"


def test_zero_parent_with_positive_children_is_illegal(spark):
    got = _run(
        spark,
        [
            ("root", "", 100.0, 100.0),
            ("root.z", "", 0.0, 100.0),
            ("root.z.q", "", 50.0, 100.0),
        ],
    )
    assert got[("root.z", "")]["verdict"] == "ILLEGAL_CHILDREN_SUM"


def test_children_sum_precision_band(spark):
    # |1 - sum| <= 0.0005 passes; beyond fails
    ok = _run(
        spark,
        [
            ("root", "", 100.0, 100.0),
            ("root.a", "", 49.90, 100.0),
            ("root.b", "", 50.00, 100.0),  # sum 99.9: off by 0.001 > band
        ],
    )
    assert ok[("root", "")]["verdict"] == "ILLEGAL_CHILDREN_SUM"
    ok2 = _run(
        spark,
        [
            ("root", "", 100.0, 100.0),
            ("root.a", "", 50.01, 100.0),
            ("root.b", "", 50.02, 100.0),  # sum 100.03 = within 0.0005
        ],
    )
    assert ok2[("root", "")]["verdict"] == "OK"


def test_abs_gt_max_flagged(spark):
    got = _run(
        spark,
        [
            ("root", "", 100.0, 100.0),
            ("root.a", "", 100.0, 50.0),   # abs 1.0 > abs-max 0.5
        ],
    )
    assert got[("root.a", "")]["verdict"] == "ILLEGAL_ABS_GT_MAX"


def test_labels_resolve_independently(spark):
    got = _run(
        spark,
        [
            ("root", "", 100.0, 100.0), ("root", "gpu", 100.0, 100.0),
            ("root.a", "", 30.0, 100.0), ("root.a", "gpu", 70.0, 100.0),
            ("root.b", "", 70.0, 100.0), ("root.b", "gpu", 30.0, 100.0),
        ],
    )
    assert got[("root.a", "")]["abs_capacity"] == 0.3
    assert got[("root.a", "gpu")]["abs_capacity"] == 0.7
    assert got[("root", "")]["verdict"] == "OK"
    assert got[("root", "gpu")]["verdict"] == "OK"
