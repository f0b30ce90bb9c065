"""AM attempt-retry pins (RMAppImpl.java:462-476 max resolution,
RMAppAttemptImpl.shouldCountTowardsMaxAttemptRetry:1587-1606,
AttemptFailedTransition:1542-1573)."""

from __future__ import annotations

from hadoop_source_spark.operators import amretry

AT_SCHEMA = "app_id long, attempt_id long, finish_time long, exit_status int"
AP_SCHEMA = (
    "app_id long, individual_max int, validity_interval long,"
    " unmanaged boolean"
)
NOW = 1_000_000


def _run(spark, attempts, apps, rm_max=4, global_max=6):
    out = amretry.attempt_retry_plan(
        spark.createDataFrame(attempts, AT_SCHEMA),
        spark.createDataFrame(apps, AP_SCHEMA),
        now_ms=NOW,
        rm_max_attempts=rm_max,
        global_max_attempts=global_max,
    ).collect()
    return {(r["app_id"], r["attempt_id"]): r for r in out}


def test_exempt_exit_statuses_do_not_count(spark):
    got = _run(
        spark,
        [(1, i, NOW - 10, s) for i, s in enumerate(
            [-102, -100, -101, -106, 1, 0]
        )],
        [(1, 4, 0, False)],
    )
    counted = {i: got[(1, i)]["counted"] for i in range(6)}
    assert counted == {0: False, 1: False, 2: False, 3: False,
                       4: True, 5: True}
    r = got[(1, 0)]
    assert r["counted_failures"] == 2
    assert r["app_action"] == "NEW_ATTEMPT"   # 2 < 4


def test_validity_interval_ages_out_failures(spark):
    # interval 100: finish at NOW-200 aged out, NOW-50 counts;
    # finish_time 0 (still running / never finished) always counts
    got = _run(
        spark,
        [(1, 0, NOW - 200, 1), (1, 1, NOW - 50, 1), (1, 2, 0, 1)],
        [(1, 2, 100, False)],
    )
    assert not got[(1, 0)]["counted"] and got[(1, 0)]["expired"]
    assert got[(1, 1)]["counted"]
    assert got[(1, 2)]["counted"]
    assert got[(1, 0)]["counted_failures"] == 2
    assert got[(1, 0)]["app_action"] == "FAIL_APPLICATION"  # 2 >= 2


def test_max_resolution_and_one_strike(spark):
    got = _run(
        spark,
        [(1, 0, NOW - 10, -102),   # exempt, but max==1 forces fail
         (2, 0, NOW - 10, 1),
         (3, 0, NOW - 10, 1)],
        [(1, 1, 0, False),
         (2, -1, 0, False),        # <=0 -> rm_max (4)
         (3, 99, 0, False)],       # > global -> global (6)
    )
    assert got[(1, 0)]["app_action"] == "FAIL_APPLICATION"
    assert got[(2, 0)]["max_app_attempts"] == 4
    assert got[(2, 0)]["app_action"] == "NEW_ATTEMPT"
    assert got[(3, 0)]["max_app_attempts"] == 6


def test_unmanaged_never_retries(spark):
    got = _run(
        spark,
        [(1, 0, NOW - 10, -102)],
        [(1, 5, 0, True)],
    )
    assert got[(1, 0)]["app_action"] == "FAIL_APPLICATION"
