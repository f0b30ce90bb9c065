"""NM node-health checking: per-script run classification and the
node-level composite health rollup.

Reference semantics (`hadoop-yarn-server-nodemanager/.../health/
NodeHealthScriptRunner.java` + `NodeHealthCheckerService.java`,
pinned by `TestNodeHealthService.java` /
`TestNodeHealthScriptRunner.java`):

- A script run lands in one HealthCheckerExitStatus
  (``NodeHealthMonitorExecutor.run:152-183``):
    TIMED_OUT            — executor reports a timeout (this wins over
                           the exception branch, :165-171);
    FAILED_WITH_EXCEPTION— non-exit-code exception, not timed out;
    FAILED_WITH_EXIT_CODE— script exited non-zero (ExitCodeException);
    FAILED               — exit 0 but some output LINE STARTS WITH
                           "ERROR" (``hasErrors:228-237``, prefix
                           match per line, case-sensitive);
    SUCCESS              — otherwise.
- ``reportHealthStatus:200-223``: SUCCESS and FAILED_WITH_EXIT_CODE
  both leave the node HEALTHY with an empty report (a syntax-error
  script must not poison the node); TIMED_OUT reports the fixed
  "Node health script timed out" message; FAILED_WITH_EXCEPTION the
  stringified exception; FAILED the full script output.
- `NodeHealthCheckerService` composes reporters (exception reporter,
  disks handler, up to 4 scripts): node healthy = ALL reporters
  healthy (``isHealthy:139-141``); the node report joins the
  NON-EMPTY reports with ";" in reporter order
  (``getHealthReport:127-133``); last-report time = max over
  reporters.

Spark-first: classification is a pure column expression over the
script-run log (the ERROR-line probe is one regexp on the output
column — `^ERROR` or a newline-anchored `ERROR`, no line explode);
the node rollup is a sorted collect_list aggregate per node, shuffled
once on node_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUCCESS = "SUCCESS"
TIMED_OUT = "TIMED_OUT"
FAILED_WITH_EXIT_CODE = "FAILED_WITH_EXIT_CODE"
FAILED_WITH_EXCEPTION = "FAILED_WITH_EXCEPTION"
FAILED = "FAILED"

TIMED_OUT_MSG = "Node health script timed out"
SEPARATOR = ";"


def classify_runs(runs: DataFrame) -> DataFrame:
    """Per-run HealthCheckerExitStatus + report.

    ``runs``: (node_id, script_name, script_order int — reporter
    registration order, run_seq, exit_code int, timed_out boolean,
    exception string nullable, output string, check_time long).

    Returns the input keys plus (status, healthy boolean, report)."""
    has_error_line = F.col("output").rlike("(^|\n)ERROR")
    status = (
        F.when(F.col("timed_out"), TIMED_OUT)
        .when(F.col("exception").isNotNull(), FAILED_WITH_EXCEPTION)
        .when(F.col("exit_code") != 0, FAILED_WITH_EXIT_CODE)
        .when(has_error_line, FAILED)
        .otherwise(SUCCESS)
    )
    healthy = status.isin(SUCCESS, FAILED_WITH_EXIT_CODE)
    report = (
        F.when(F.col("__status") == TIMED_OUT, F.lit(TIMED_OUT_MSG))
        .when(F.col("__status") == FAILED_WITH_EXCEPTION, F.col("exception"))
        .when(F.col("__status") == FAILED, F.col("output"))
        .otherwise(F.lit(""))
    )
    return (
        runs.withColumn("__status", status)
        .select(
            "node_id",
            "script_name",
            "script_order",
            "run_seq",
            "check_time",
            F.col("__status").alias("status"),
            healthy.alias("healthy"),
            report.alias("report"),
        )
    )


def node_health_report(runs: DataFrame) -> DataFrame:
    """Composite node health from the LATEST run of each reporter
    (NodeHealthCheckerService merge).

    Returns (node_id, healthy boolean, health_report string —
    non-empty latest reports joined with ";" in script_order,
    last_report_time long, n_reporters, n_unhealthy)."""
    classified = classify_runs(runs)
    latest = classified.groupBy("node_id", "script_name").agg(
        F.max_by(
            F.struct("script_order", "healthy", "report", "check_time"),
            "run_seq",
        ).alias("s")
    ).select("node_id", "script_name", "s.*")
    joined_report = F.array_join(
        F.filter(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("script_order", "report"))
                ),
                lambda s: s["report"],
            ),
            lambda r: r != "",
        ),
        SEPARATOR,
    )
    return latest.groupBy("node_id").agg(
        F.min("healthy").alias("healthy"),
        joined_report.alias("health_report"),
        F.max("check_time").alias("last_report_time"),
        F.count(F.lit(1)).alias("n_reporters"),
        F.sum(F.when(F.col("healthy"), 0).otherwise(1)).alias(
            "n_unhealthy"
        ),
    )
