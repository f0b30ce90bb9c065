"""NM container relaunch pins (ContainerImpl.shouldRetry:1765-1772;
SlidingWindowRetryPolicy.shouldRetry:45-58,
calculateRemainingRetries:66-84; ContainerExecutor.ExitCode:507-511;
ContainerRetryContext.RETRY_FOREVER:64)."""

from __future__ import annotations

from hadoop_source_spark.operators import contretry

NOW = 100_000
SCHEMA = (
    "container_id long, exit_code int, policy string,"
    " error_codes array<int>, max_retries int, retry_interval_ms int,"
    " validity_ms long, restart_times array<long>,"
    " remaining_retries int"
)

BASE = dict(
    exit_code=1, policy="RETRY_ON_ALL_ERRORS", error_codes=None,
    max_retries=3, retry_interval_ms=500, validity_ms=0,
    restart_times=[], remaining_retries=3,
)
KEYS = ("exit_code", "policy", "error_codes", "max_retries",
        "retry_interval_ms", "validity_ms", "restart_times",
        "remaining_retries")


def _run(spark, rows):
    data = [
        (i,) + tuple({**BASE, **over}[k] for k in KEYS)
        for i, over in enumerate(rows)
    ]
    out = contretry.relaunch_plan(
        spark.createDataFrame(data, SCHEMA), now_ms=NOW
    ).collect()
    return {r["container_id"]: r for r in out}


def test_exit_exclusions_and_policy_gate(spark):
    got = _run(spark, [
        {"exit_code": 0},     # SUCCESS never retries
        {"exit_code": 137},   # FORCE_KILLED
        {"exit_code": 143},   # TERMINATED
        {"policy": "NEVER_RETRY"},
        {"policy": "RETRY_ON_SPECIFIC_ERROR_CODES",
         "error_codes": [5, 7], "exit_code": 9},
        {"policy": "RETRY_ON_SPECIFIC_ERROR_CODES",
         "error_codes": None, "exit_code": 9},  # null set never matches
        {"policy": "RETRY_ON_SPECIFIC_ERROR_CODES",
         "error_codes": [5, 9], "exit_code": 9},
    ])
    for i in (0, 1, 2):
        assert got[i]["action"] == "EXIT_EXCLUDED"
    assert got[3]["action"] == "POLICY_NEVER"
    assert got[4]["action"] == "CODE_NOT_LISTED"
    assert got[5]["action"] == "CODE_NOT_LISTED"
    assert got[6]["action"] == "RETRY"
    assert got[6]["relaunch_delay_ms"] == 500


def test_retry_forever_skips_counting(spark):
    got = _run(spark, [{
        "max_retries": -1, "validity_ms": 10,
        "restart_times": [NOW - 1, NOW - 2, NOW - 3],
    }])
    assert got[0]["action"] == "RETRY_FOREVER"
    assert got[0]["valid_failures"] is None
    assert got[0]["relaunch_delay_ms"] == 500


def test_sliding_window_counts_recent_suffix_with_break(spark):
    got = _run(spark, [
        # ascending times; two within the 1000ms window -> 3-2=1 left
        {"validity_ms": 1000, "max_retries": 3,
         "restart_times": [NOW - 5000, NOW - 900, NOW - 100]},
        # all three recent -> exhausted
        {"validity_ms": 1000, "max_retries": 3,
         "restart_times": [NOW - 900, NOW - 500, NOW - 100]},
        # the BREAK: a stale entry hides the recent one before it
        {"validity_ms": 1000, "max_retries": 3,
         "restart_times": [NOW - 100, NOW - 5000, NOW - 200]},
    ])
    assert (got[0]["action"], got[0]["valid_failures"],
            got[0]["remaining"]) == ("RETRY", 2, 1)
    assert (got[1]["action"], got[1]["valid_failures"]) == (
        "EXHAUSTED", 3)
    assert (got[2]["valid_failures"], got[2]["remaining"]) == (1, 2)


def test_counter_path_without_window(spark):
    got = _run(spark, [
        {"validity_ms": 0, "remaining_retries": 1},
        {"validity_ms": 0, "remaining_retries": 0},
        {"validity_ms": -1, "remaining_retries": 2,
         "restart_times": [NOW - 1]},  # window disabled: times ignored
    ])
    assert got[0]["action"] == "RETRY"
    assert got[0]["valid_failures"] is None
    assert got[0]["remaining"] == 1
    assert got[1]["action"] == "EXHAUSTED"
    assert got[2]["action"] == "RETRY"
