"""Router safemode pins (RouterSafemodeService.periodicInvoke:163-187
boundaries; leave:118-130 dwell time; manual stickiness :181-184)."""

from __future__ import annotations

from hadoop_source_spark.operators import rbfmembership

NOW = 1_000_000
SCHEMA = (
    "router_id long, startup_time_ms long, cache_update_time_ms long,"
    " safe_mode boolean, manual boolean, enter_time_ms long"
)


def _run(spark, rows):
    out = rbfmembership.router_safemode_plan(
        spark.createDataFrame(rows, SCHEMA),
        startup_interval_ms=60_000, stale_interval_ms=30_000,
        now_ms=NOW,
    ).collect()
    return {r["router_id"]: r for r in out}


def test_boundaries_and_manual_stickiness(spark):
    fresh, stale_t = NOW - 10, NOW - 30_001
    got = _run(spark, [
        # delta == startupInterval is NOT a delay (strict <)
        (0, NOW - 60_000, fresh, True, False, NOW - 5_000),
        (1, NOW - 59_999, stale_t, False, False, 0),  # still delayed
        # staleness is strict >: exactly staleInterval old is fresh
        (2, NOW - 100_000, NOW - 30_000, True, False, NOW - 7_000),
        (3, NOW - 100_000, stale_t, False, False, 0),   # enter
        (4, NOW - 100_000, stale_t, True, True, 0),     # remain (stale)
        (5, NOW - 100_000, fresh, True, True, 0),       # manual sticks
        (6, NOW - 100_000, fresh, False, False, 0),     # normal
    ])
    assert got[0]["action"] == rbfmembership.LEAVE
    assert got[0]["safemode_time_ms"] == 5_000
    assert got[0]["safe_mode_after"] is False
    assert got[1]["action"] == rbfmembership.STARTUP_DELAY
    assert got[1]["safe_mode_after"] is False
    assert got[2]["action"] == rbfmembership.LEAVE
    assert got[2]["safemode_time_ms"] == 7_000
    assert got[3]["action"] == rbfmembership.ENTER
    assert got[3]["safe_mode_after"] is True
    assert got[4]["action"] == rbfmembership.REMAIN_STALE
    assert got[5]["action"] == rbfmembership.REMAIN_MANUAL
    assert got[5]["safe_mode_after"] is True
    assert got[6]["action"] == rbfmembership.NORMAL
