"""YARN ReservationSystem admission pins (RLESparseResourceAllocation
staircase algebra, NoOverCommitPolicy, CapacityOverTimePolicy maxInst)."""

from __future__ import annotations

from hadoop_source_spark.operators import reservations as rv


def _alloc(spark, rows):
    return spark.createDataFrame(
        rows, "queue string, user string, start long, end long, amount long"
    )


def _reqs(spark, rows):
    return spark.createDataFrame(
        rows,
        "request_id long, queue string, user string, start long, "
        "end long, amount long",
    )


def test_rle_staircase_merges_fronts(spark):
    # two overlapping reservations: [0,10)x5 and [5,15)x3 → loads
    # 5 on [0,5), 8 on [5,10), 3 on [10,15), 0 after — exactly the
    # NavigableMap addInterval merge
    alloc = _alloc(spark, [("q", "a", 0, 10, 5), ("q", "b", 5, 15, 3)])
    out = {r.t: (r.load, r.t_next) for r in
           rv.rle_staircase(alloc, ["queue"]).collect()}
    assert out[0] == (5, 5)
    assert out[5] == (8, 10)
    assert out[10] == (3, 15)
    assert out[15][0] == 0  # all fronts cancel


def test_admission_plan_capacity_boundary(spark):
    existing = _alloc(spark, [("q", "a", 0, 10, 8)])
    caps = spark.createDataFrame([("q", 10)], "queue string, capacity long")
    reqs = _reqs(spark, [
        (1, "q", "b", 0, 5, 2),    # 8+2 = 10 ≤ 10: fits exactly
        (2, "q", "b", 0, 5, 3),    # 8+3 = 11 > 10: REJECT
        (3, "q", "b", 10, 20, 10),  # plan free past t=10: fits
        (4, "q", "b", 9, 11, 3),   # overlaps the loaded [0,10): REJECT
    ])
    out = {r.request_id: r for r in
           rv.reservation_admission(reqs, existing, caps).collect()}
    assert out[1].accepted and out[1].headroom == 0
    assert out[2].reject_reason == "PLAN_CAPACITY"
    assert out[3].accepted and out[3].peak_load == 0
    assert out[4].reject_reason == "PLAN_CAPACITY" and out[4].peak_load == 8


def test_admission_user_instantaneous_quota(spark):
    # CapacityOverTimePolicy maxInst: the USER's own staircase gates
    # even when the plan has room
    existing = _alloc(spark, [
        ("q", "a", 0, 10, 4),
        ("q", "b", 0, 10, 4),
    ])
    caps = spark.createDataFrame([("q", 100)], "queue string, capacity long")
    reqs = _reqs(spark, [
        (1, "q", "a", 0, 5, 2),   # a at 4+2 = 6 > 100*0.05: REJECT
        (2, "q", "c", 0, 5, 5),   # fresh user, 0+5 ≤ 5: fits exactly
        (3, "q", "c", 0, 5, 6),   # fresh user over quota: REJECT
    ])
    out = {r.request_id: r for r in
           rv.reservation_admission(reqs, existing, caps,
                                    max_inst=0.05).collect()}
    assert out[1].reject_reason == "USER_INSTANTANEOUS_QUOTA"
    assert out[1].user_peak == 4
    assert out[2].accepted
    assert out[3].reject_reason == "USER_INSTANTANEOUS_QUOTA"


def test_admission_capacity_checked_before_quota(spark):
    # validate() order: plan capacity (NoOverCommitPolicy) fires first
    existing = _alloc(spark, [("q", "a", 0, 10, 9)])
    caps = spark.createDataFrame([("q", 10)], "queue string, capacity long")
    reqs = _reqs(spark, [(1, "q", "a", 0, 5, 5)])  # violates BOTH
    r = rv.reservation_admission(reqs, existing, caps,
                                 max_inst=0.05).collect()[0]
    assert r.reject_reason == "PLAN_CAPACITY"


def test_admission_empty_queue_plan(spark):
    # a queue with no accepted reservations admits up to capacity
    existing = _alloc(spark, [("other", "a", 0, 10, 5)])
    caps = spark.createDataFrame(
        [("q", 10), ("other", 10)], "queue string, capacity long"
    )
    reqs = _reqs(spark, [(1, "q", "z", 0, 100, 10),
                         (2, "q", "z", 0, 100, 11)])
    out = {r.request_id: r for r in
           rv.reservation_admission(reqs, existing, caps).collect()}
    assert out[1].accepted and out[1].peak_load == 0
    assert not out[2].accepted


def _caps(spark, cap=40):
    return spark.createDataFrame([("q", cap)], "queue string, capacity long")


def test_integral_quota_steady_load_within_budget(spark):
    # existing [0,10)x8 + request [10,20)x8: continuous load 8 for 20
    # units — every W=10 window averages 8 <= 0.25*40=10: OK.
    # request 2 doubles to 16 in its window: the [10,20] window
    # averages 16 > 10: REJECT.
    existing = _alloc(spark, [("q", "a", 0, 10, 8)])
    reqs = _reqs(spark, [(1, "q", "a", 10, 20, 8),
                         (2, "q", "a", 10, 20, 16)])
    out = {r.request_id: r for r in rv.integral_quota_check(
        reqs, existing, _caps(spark), max_avg=0.25,
        valid_window=10).collect()}
    assert out[1].integral_peak == 8 and out[1].integral_ok
    assert out[1].integral_limit == 10
    assert out[2].integral_peak == 16 and not out[2].integral_ok


def test_integral_quota_clips_old_consumption(spark):
    # 100 units of prior load, but only the [start-W, end+W] range
    # counts (CapacityOverTimePolicy.java:95 checkStart): the clipped
    # integral window sees level 4 for 10 units then the 1-unit tail
    existing = _alloc(spark, [("q", "a", 0, 100, 4)])
    reqs = _reqs(spark, [(1, "q", "a", 100, 110, 1)])
    r = rv.integral_quota_check(
        reqs, existing, _caps(spark), max_avg=0.125,
        valid_window=10).collect()[0]
    assert r.integral_peak == 4 and r.integral_limit == 5
    assert r.integral_ok


def test_integral_quota_intermediate_points_staircase(spark):
    # a request longer than the window with NO existing load: the
    # reference inserts intermediate points every W (:132-146); the
    # up/down staircase then reads 2 through the body and 3 at the
    # final breakpoint (the staircase's conservative overestimate at
    # segment ends — pinned as the REFERENCE's value, not the true
    # sliding average 2)
    existing = _alloc(spark, [("qq", "z", 0, 1, 1)])  # other queue/user
    reqs = _reqs(spark, [(1, "q", "a", 0, 35, 2)])
    r = rv.integral_quota_check(
        reqs, existing, _caps(spark), max_avg=0.0625,
        valid_window=10).collect()[0]
    assert r.integral_peak == 3
    assert r.integral_limit == 2
    assert not r.integral_ok
