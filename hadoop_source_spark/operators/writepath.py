"""DFS client write-pipeline recovery: the replace-datanode-on-failure
decision.

Reference semantics
(`hdfs-client/protocol/datatransfer/ReplaceDatanodeOnFailure.java`):
- when a datanode in a write pipeline fails, the client decides
  whether to ask the NameNode for a REPLACEMENT node before resuming
  the write (`satisfy` :128-136): never when no node failed out of
  reach (n == 0) or the pipeline is still full (n >= replication);
  otherwise by policy —
  * DEFAULT (:31-44): replace only when replication >= 3 AND
    (n <= replication/2 — integer division — OR the block is being
    appended OR it was hflushed: readers may already depend on it);
  * ALWAYS: replace whenever a node was removed; NEVER / DISABLE:
    never (DISABLE additionally makes the client error on use,
    `checkEnabled` :112);
- best effort (:120-127): if the REPLACEMENT ITSELF fails, bestEffort
  = true continues the write with the degraded pipeline, false throws
  and the write fails.

Spark-first: the whole policy is one cascading when-expression over a
pipeline-failure event table — no joins, no UDFs, pure codegen; a
fleet's worth of failure events classifies in a scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pipeline_recovery_plan(failures: DataFrame) -> DataFrame:
    """Classify write-pipeline failure events. Columns in: policy
    ('DEFAULT'|'ALWAYS'|'NEVER'|'DISABLE'), best_effort (bool),
    replication (int), n_remaining (surviving pipeline nodes),
    is_append, is_hflushed (bool), replacement_ok (bool — whether the
    replacement attempt, if the policy asks for one, succeeds).

    Output adds needs_replacement (`satisfy`'s exact value) and
    action: ABORT_NO_DATANODES (nothing left to write to — the
    streamer aborts regardless of policy), REPLACED_CONTINUE,
    CONTINUE (the pipeline is still full — no node actually left),
    CONTINUE_DEGRADED (short pipeline continues: replacement failed
    but bestEffort, or the policy didn't require one), WRITE_FAILED
    (replacement failed, bestEffort off)."""
    r = F.col("replication")
    n = F.col("n_remaining")
    cond_default = (r >= 3) & (
        (n <= F.floor(r / 2)) | F.col("is_append") | F.col("is_hflushed")
    )
    policy_cond = (
        F.when(F.col("policy") == "ALWAYS", F.lit(True))
        .when(F.col("policy") == "DEFAULT", cond_default)
        .otherwise(F.lit(False))  # NEVER / DISABLE
    )
    needs = (n > 0) & (n < r) & policy_cond
    action = (
        F.when(n == 0, F.lit("ABORT_NO_DATANODES"))
        .when(needs & F.col("replacement_ok"), F.lit("REPLACED_CONTINUE"))
        .when(
            needs & ~F.col("replacement_ok") & F.col("best_effort"),
            F.lit("CONTINUE_DEGRADED"),
        )
        .when(needs & ~F.col("replacement_ok"), F.lit("WRITE_FAILED"))
        .when(n >= r, F.lit("CONTINUE"))
        .otherwise(F.lit("CONTINUE_DEGRADED"))
    )
    return failures.select(
        *failures.columns,
        needs.alias("needs_replacement"),
        action.alias("action"),
    )
