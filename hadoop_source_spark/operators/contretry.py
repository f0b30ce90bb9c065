"""NM container relaunch policy: whether a finished container is
restarted in place (the NM-side sliding-window retry, distinct from
the RM's application-attempt budget in `operators/amretry`).

Reference semantics:

- ``ContainerImpl.shouldRetry:1765-1772``: exit codes 0 (SUCCESS),
  137 (FORCE_KILLED) and 143 (TERMINATED) never retry — deliberate
  stops are not failures (``ContainerExecutor.ExitCode:507-511``).
- ``SlidingWindowRetryPolicy.shouldRetry:45-58``: the policy gate —
  RETRY_ON_ALL_ERRORS, or RETRY_ON_SPECIFIC_ERROR_CODES with the
  exit code present in the configured set (a null set never
  matches); NEVER_RETRY fails the gate. An eligible container with
  ``maxRetries == RETRY_FOREVER (-1)`` always retries
  (``ContainerRetryContext.java:64``).
- ``calculateRemainingRetries:66-84``: with a positive
  ``failuresValidityInterval`` the valid-failure count walks the
  restart-time list NEWEST-first and BREAKS at the first entry
  older than the interval (times are appended in clock order, so
  this is the contiguous recent suffix); remaining = maxRetries -
  validFailuresCount. Without a validity interval the pre-decremented
  ``remainingRetries`` counter decides.

Spark-first: the suffix walk compiles to one ``F.aggregate`` fold
with an explicit stopped flag over the reversed array — the break
is faithful even for out-of-order input — and everything else is a
codegen when-chain; no joins, no shuffles, map-side at any fleet
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RETRY_FOREVER = -1
_EXCLUDED_EXITS = (0, 137, 143)

EXIT_EXCLUDED = "EXIT_EXCLUDED"
POLICY_NEVER = "POLICY_NEVER"
CODE_NOT_LISTED = "CODE_NOT_LISTED"
FOREVER = "RETRY_FOREVER"
RETRY = "RETRY"
EXHAUSTED = "EXHAUSTED"


def relaunch_plan(containers: DataFrame, *, now_ms: int) -> DataFrame:
    """Relaunch decision per finished container.

    ``containers``: (container_id, exit_code int, policy string
    NEVER_RETRY | RETRY_ON_ALL_ERRORS | RETRY_ON_SPECIFIC_ERROR_CODES,
    error_codes array<int> nullable, max_retries int — -1 retries
    forever, retry_interval_ms int, validity_ms long — <= 0 disables
    the sliding window, restart_times array<long> — append order,
    remaining_retries int — the no-window counter).

    Returns (container_id, action, valid_failures int nullable,
    remaining int nullable, relaunch_delay_ms int nullable)."""
    exit_code = F.col("exit_code")
    policy = F.col("policy")
    eligible = (policy == "RETRY_ON_ALL_ERRORS") | (
        (policy == "RETRY_ON_SPECIFIC_ERROR_CODES")
        & F.col("error_codes").isNotNull()
        & F.array_contains("error_codes", exit_code)
    )
    # newest-first walk with the reference's break-at-first-stale
    valid_failures = F.aggregate(
        F.reverse("restart_times"),
        F.struct(
            F.lit(0).alias("cnt"), F.lit(False).alias("stopped")
        ),
        lambda acc, t: F.struct(
            F.when(
                ~acc["stopped"]
                & (F.lit(now_ms) - t <= F.col("validity_ms")),
                acc["cnt"] + 1,
            )
            .otherwise(acc["cnt"])
            .alias("cnt"),
            (
                acc["stopped"]
                | (F.lit(now_ms) - t > F.col("validity_ms"))
            ).alias("stopped"),
        ),
    )["cnt"]
    windowed = F.col("validity_ms") > 0
    remaining = F.when(
        windowed, F.col("max_retries") - valid_failures
    ).otherwise(F.col("remaining_retries"))

    action = (
        F.when(exit_code.isin(*_EXCLUDED_EXITS), EXIT_EXCLUDED)
        .when(policy == "NEVER_RETRY", POLICY_NEVER)
        .when(~eligible, CODE_NOT_LISTED)
        .when(F.col("max_retries") == RETRY_FOREVER, FOREVER)
        .when(remaining > 0, RETRY)
        .otherwise(EXHAUSTED)
    )
    counting = action.isin(RETRY, EXHAUSTED)
    return containers.select(
        "container_id",
        action.alias("action"),
        F.when(counting & windowed, valid_failures)
        .cast("int")
        .alias("valid_failures"),
        F.when(counting, remaining).cast("int").alias("remaining"),
        F.when(
            action.isin(RETRY, FOREVER), F.col("retry_interval_ms")
        ).alias("relaunch_delay_ms"),
    )
