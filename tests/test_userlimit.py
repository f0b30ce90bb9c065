"""CapacityScheduler user-limit pins (UsersManager.java:705-829
computeUserLimit, DefaultResourceCalculator rounding)."""

from __future__ import annotations

from hadoop_source_spark.operators import userlimit

SCHEMA = (
    "row_id long, partition_resource long, effective_capacity long,"
    " min_alloc long, usage_ratio double, active_used long,"
    " active_weights double, all_weights double, ul_percent long,"
    " ul_factor double, respect_exclusivity boolean, active_user boolean"
)


def _run(spark, rows):
    out = userlimit.compute_user_limits(
        spark.createDataFrame(rows, SCHEMA)
    ).collect()
    return {r["row_id"]: r for r in out}


def test_active_user_respect_mode(spark):
    # consumed=32768, current=33280; by_share ceil(10752/3)=3584,
    # by_percent ceil(33280*25/100)=8320; max_ul floor(8192*1.5)=12288;
    # final roundUp(8320, 512)=8704
    got = _run(
        spark,
        [(1, 65536, 8192, 512, 0.5, 10240, 3.0, 5.0, 25, 1.5, True, True)],
    )[1]
    assert got["queue_capacity"] == 8192
    assert got["consumed"] == 32768
    assert got["current_capacity"] == 33280
    assert got["user_limit_resource"] == 8320
    assert got["max_user_limit"] == 12288
    assert got["user_limit"] == 8704


def test_miniscule_queue_and_roundup_past_cap(spark):
    # zero-capacity queue floors at minAlloc; the final roundUp is
    # applied AFTER the maxUserLimit min, so it can exceed the cap
    got = _run(
        spark,
        [(1, 65536, 0, 512, 0.0, 0, 1.0, 2.0, 50, 0.25, True, False)],
    )[1]
    assert got["queue_capacity"] == 512
    assert got["current_capacity"] == 512
    assert got["user_limit_resource"] == 256
    assert got["max_user_limit"] == 128
    assert got["user_limit"] == 512


def test_ignore_exclusivity_caps_at_partition(spark):
    got = _run(
        spark,
        [(1, 65536, 8192, 512, 0.5, 10240, 3.0, 5.0, 25, 1.5, False, True)],
    )[1]
    assert got["max_user_limit"] == 65536
    assert got["user_limit"] == 8704  # same ulr, looser cap, same round


def test_usage_ratio_above_one(spark):
    # DRF-summed ratios may exceed 1: consumed rounds up from 1500.5
    got = _run(
        spark,
        [(1, 1000, 1024, 256, 1.5, 0, 1.0, 1.0, 100, 4.0, True, False)],
    )[1]
    assert got["consumed"] == 1536
    assert got["current_capacity"] == 1792  # over capacity: consumed+req


def test_non_active_uses_current_capacity_and_all_weights(spark):
    # non-active: resourceUsed=currentCapacity(8192), weights=4
    got = _run(
        spark,
        [(1, 65536, 8192, 512, 0.0, 99999, 2.0, 4.0, 10, 2.0, True, False)],
    )[1]
    # by_share ceil(8192/4)=2048, by_percent ceil(8192*10/100)=820
    assert got["user_limit_resource"] == 2048
    assert got["user_limit"] == 2048  # already a minAlloc multiple


H_SCHEMA = (
    "row_id long, user_limit long, user_used long,"
    " queue_current_limit long, queue_used long,"
    " cluster_partition_resource long, cluster_used long, min_alloc long"
)


def _headroom(spark, rows):
    out = userlimit.compute_headroom(
        spark.createDataFrame(rows, H_SCHEMA)
    ).collect()
    return {r["row_id"]: r for r in out}


def test_headroom_min_round_then_cluster_cap(spark):
    # min(8000-3000, 12000-9000)=3000 -> roundDown(512)=2560;
    # cluster free 10000 doesn't bind
    got = _headroom(spark, [(1, 8000, 3000, 12000, 9000, 50000, 40000, 512)])
    assert got[1]["headroom_rounded"] == 2560
    assert got[1]["headroom"] == 2560


def test_headroom_cluster_cap_after_rounding(spark):
    # rounded 2560, but only 100 free in the partition: final 100
    # (NOT a minAlloc multiple — the cluster min comes after rounding)
    got = _headroom(spark, [(1, 8000, 3000, 12000, 9000, 50000, 49900, 512)])
    assert got[1]["headroom"] == 100


def test_headroom_clamps_user_and_queue_but_not_cluster(spark):
    got = _headroom(
        spark,
        [
            (1, 2000, 3000, 12000, 1000, 50000, 0, 512),   # user over limit
            (2, 8000, 0, 9000, 9500, 50000, 0, 512),       # queue over limit
            (3, 8000, 0, 12000, 0, 5000, 6000, 512),       # cluster negative
        ],
    )
    assert got[1]["headroom"] == 0
    assert got[2]["headroom"] == 0
    # subtract (not subtractNonNegative) on the cluster term: faithful
    assert got[3]["headroom"] == -1000
