"""Speculative-execution planning for straggler tasks.

Reference semantics (`hadoop-mapreduce-client-app` speculate/
DefaultSpeculator.java + LegacyTaskRuntimeEstimator.java):
- a RUNNING task's estimated total runtime extrapolates its progress
  rate: estimatedRuntime = elapsed / progress, so estimatedEndTime =
  start + elapsed/progress (`LegacyTaskRuntimeEstimator.
  estimatedRuntime`);
- the replacement would start NOW and is assumed to take the mean
  runtime of the job's COMPLETED tasks
  (`estimatedNewAttemptRuntime`);
- speculate when estimatedEndTime > estimatedReplacementEndTime =
  now + meanCompletedRuntime (`DefaultSpeculator.speculationValue`) —
  and never for a task that already has a second attempt running or
  whose progress is ~done;
- one speculative attempt max per task, jobs without completed tasks
  have no estimator baseline → no speculation.

Spark-first: the per-job baseline is one partial-agg groupBy over the
completed slice, broadcast back onto the running tasks; the decision
is then a pure projection. All time math in epoch seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def speculation_plan(
    tasks: DataFrame,
    now: DataFrame,
    min_progress: float = 0.05,
    done_progress: float = 0.95,
) -> DataFrame:
    """tasks: job, task_id, start_s (bigint epoch), progress (0..1],
    state ('RUNNING'|'SUCCEEDED'), runtime_s (completed tasks only),
    has_speculative (bool). now: ONE-ROW frame with now_s.

    Output — running tasks only: job, task_id, progress, elapsed_s,
    est_end_s, replacement_end_s (null when the job has no completed
    baseline), speculate + reason. Tasks under `min_progress` are too
    young to extrapolate (the estimator returns ~infinite runtimes);
    tasks past `done_progress` finish before any replacement could."""
    baseline = (
        tasks.filter(F.col("state") == "SUCCEEDED")
        .groupBy("job")
        .agg(F.avg("runtime_s").alias("mean_runtime_s"))
    )
    running = (
        tasks.filter(F.col("state") == "RUNNING")
        .join(F.broadcast(baseline), "job", "left")
        .crossJoin(F.broadcast(now))
        .withColumn("elapsed_s", F.col("now_s") - F.col("start_s"))
        # floor, not cast: Spark's double->long cast truncates while
        # DuckDB's rounds — floor() agrees everywhere
        .withColumn(
            "est_end_s",
            F.floor(
                F.col("start_s")
                + F.col("elapsed_s") / F.col("progress")
            ),
        )
        .withColumn(
            "replacement_end_s",
            F.floor(F.col("now_s") + F.col("mean_runtime_s")),
        )
    )
    reason = (
        F.when(F.col("has_speculative"), F.lit("ALREADY_SPECULATING"))
        .when(F.col("progress") >= done_progress, F.lit("NEARLY_DONE"))
        .when(F.col("progress") < min_progress, F.lit("TOO_YOUNG"))
        .when(F.col("replacement_end_s").isNull(), F.lit("NO_BASELINE"))
        .when(
            F.col("est_end_s") > F.col("replacement_end_s"),
            F.lit("SPECULATE"),
        )
        .otherwise(F.lit("ON_TRACK"))
    )
    return running.select(
        "job",
        "task_id",
        F.round("progress", 4).alias("progress"),
        "elapsed_s",
        "est_end_s",
        "replacement_end_s",
        reason.alias("reason"),
        (reason == "SPECULATE").alias("speculate"),
    )
