"""AM attempt-retry accounting: whether an application's latest AM
failure exhausts its retry budget.

Reference semantics (`hadoop-yarn-server-resourcemanager/.../rmapp/`):

- ``RMAppImpl.java:462-476``: the effective max attempts — a
  non-positive per-app request falls back to
  yarn.resourcemanager.am.max-attempts; one above the global cap
  clamps to yarn.resourcemanager.am.global.max-attempts; otherwise
  the request stands.
- ``RMAppAttemptImpl.shouldCountTowardsMaxAttemptRetry:1587-1606``:
  an attempt does NOT count when the failure-validity interval is
  positive and its finish time has aged out, nor when its AM
  container exited with PREEMPTED (-102), ABORTED (-100),
  DISKS_FAILED (-101) or KILLED_BY_RESOURCEMANAGER (-106) — fault-of-
  the-platform failures never burn user budget.
- ``RMAppImpl.getNumFailedAppAttempts:930-941`` sums the counted
  attempts; ``AttemptFailedTransition:1542-1573``: maxAppAttempts ==
  1 forces the count to the max (one strike regardless of exemption),
  and an unmanaged AM never retries; otherwise the app retries while
  the counted failures stay BELOW the max.

Spark-first: one shuffle on app_id (the counted-failure window) after
a broadcast join to the conf-sized app table; the per-attempt
exemption test is pure codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EXEMPT_EXITS = (-102, -100, -101, -106)

FAIL_APP = "FAIL_APPLICATION"
NEW_ATTEMPT = "NEW_ATTEMPT"


def attempt_retry_plan(
    attempts: DataFrame,
    apps: DataFrame,
    *,
    now_ms: int,
    rm_max_attempts: int,
    global_max_attempts: int,
) -> DataFrame:
    """Evaluate every app's retry state after its latest AM failure.

    ``attempts``: (app_id, attempt_id, finish_time long ms,
    exit_status int). ``apps``: (app_id, individual_max int,
    validity_interval long ms — 0 disables aging, unmanaged boolean).

    Returns one row per attempt with the per-attempt accounting
    (expired, exempt_exit, counted) and the app-level resolution
    (max_app_attempts, counted_failures, app_action)."""
    max_attempts = (
        F.when(F.col("individual_max") <= 0, F.lit(rm_max_attempts))
        .when(
            F.col("individual_max") > global_max_attempts,
            F.lit(global_max_attempts),
        )
        .otherwise(F.col("individual_max"))
    )
    expired = (
        (F.col("validity_interval") > 0)
        & (F.col("finish_time") > 0)
        & (F.col("finish_time") < now_ms - F.col("validity_interval"))
    )
    exempt = F.col("exit_status").isin(*EXEMPT_EXITS)
    counted = ~expired & ~exempt
    wa = Window.partitionBy("app_id")
    staged = (
        attempts.join(F.broadcast(apps), "app_id")
        .withColumn("max_app_attempts", max_attempts.cast("int"))
        .withColumn("expired", expired)
        .withColumn("exempt_exit", exempt)
        .withColumn("counted", counted)
        .withColumn(
            "counted_failures",
            F.sum(counted.cast("long")).over(wa).cast("int"),
        )
    )
    failures = F.when(
        F.col("max_app_attempts") == 1, F.col("max_app_attempts")
    ).otherwise(F.col("counted_failures"))
    action = F.when(
        F.col("unmanaged")
        | (failures >= F.col("max_app_attempts")),
        F.lit(FAIL_APP),
    ).otherwise(F.lit(NEW_ATTEMPT))
    return staged.select(
        "app_id",
        "attempt_id",
        "exit_status",
        "expired",
        "exempt_exit",
        "counted",
        "max_app_attempts",
        "counted_failures",
        action.alias("app_action"),
    )
