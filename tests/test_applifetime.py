"""App-lifetime pins (CapacityScheduler.checkAndGetApplicationLifetime
:3228-3258; RMAppManager.updateApplicationTimeout:671-732;
RMServerUtils:560 strict-before-now; RMAppLifetimeMonitor.expire)."""

from __future__ import annotations

from hadoop_source_spark.operators import applifetime

NOW = 1_000_000
APPS_SCHEMA = (
    "app_id long, queue string, requested_lifetime_sec long,"
    " submit_time_ms long, completed boolean, update_expire_ms long"
)
Q_SCHEMA = (
    "queue string, is_leaf boolean, default_lifetime_sec long,"
    " max_lifetime_sec long"
)
QUEUES = [
    ("leaf", True, 100, 500),
    ("nolimit", True, 100, 0),
    ("parent", False, 100, 500),
]


def _run(spark, apps):
    out = applifetime.lifetime_plan(
        spark.createDataFrame(apps, APPS_SCHEMA),
        spark.createDataFrame(QUEUES, Q_SCHEMA),
        now_ms=NOW,
    ).collect()
    return {r["app_id"]: r for r in out}


def test_effective_lifetime_resolution(spark):
    got = _run(spark, [
        (0, "leaf", -1, NOW, False, None),      # default
        (1, "leaf", 9999, NOW, False, None),    # cut to max
        (2, "leaf", 200, NOW, False, None),     # stands
        (3, "nolimit", -1, NOW, False, None),   # default, no max
        (4, "nolimit", 9999, NOW, False, None),  # unlimited: stands
        (5, "parent", -7, NOW, False, None),    # non-leaf passthrough
        (6, "ghost", 42, NOW, False, None),     # unknown passthrough
    ])
    assert got[0]["effective_lifetime_sec"] == 100
    assert got[1]["effective_lifetime_sec"] == 500
    assert got[2]["effective_lifetime_sec"] == 200
    assert got[3]["effective_lifetime_sec"] == 100
    assert got[4]["effective_lifetime_sec"] == 9999
    assert got[5]["effective_lifetime_sec"] == -7
    assert got[5]["verdict"] == applifetime.NOT_MONITORED
    assert got[6]["effective_lifetime_sec"] == 42


def test_update_boundaries_and_expiry(spark):
    got = _run(spark, [
        # strict <: update == now passes validation
        (0, "leaf", 100, NOW - 100_000, False, NOW),
        (1, "leaf", 100, NOW - 100_000, False, NOW - 1),
        # cap: leaf max 500s from submit
        (2, "leaf", 100, NOW, False, NOW + 500_000 + 1),
        (3, "leaf", 100, NOW, True, NOW + 50_000),
        # update registers a previously unmonitored app
        (4, "nolimit", -1, NOW, False, NOW + 50_000),
        # expiry sweep on the base path
        (5, "leaf", 100, NOW - 100_001, False, None),
    ])
    assert got[0]["update_outcome"] == applifetime.UPD_APPLIED
    assert got[0]["expire_ms"] == NOW
    assert got[0]["verdict"] == applifetime.EXPIRE_KILL
    assert got[1]["update_outcome"] == applifetime.UPD_REJECTED_PAST
    # rejected update keeps the base expiry: submit+100s < now
    assert got[1]["verdict"] == applifetime.EXPIRE_KILL
    assert got[2]["update_outcome"] == applifetime.UPD_APPLIED_CAPPED
    assert got[2]["expire_ms"] == NOW + 500_000
    assert got[3]["update_outcome"] == applifetime.UPD_IGNORED_COMPLETED
    assert got[3]["verdict"] == applifetime.COMPLETED
    assert got[3]["expire_ms"] is None
    # queue 'nolimit' has default 100 -> eff 100 -> actually monitored
    # via the base path too; the update overrides the expiry.
    assert got[4]["update_outcome"] == applifetime.UPD_APPLIED
    assert got[4]["expire_ms"] == NOW + 50_000
    assert got[5]["verdict"] == applifetime.EXPIRE_KILL
