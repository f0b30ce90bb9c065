"""AM-container node blacklisting: which nodes an application's AM
scheduling should avoid, and when the blacklist trips its disable
threshold and is released wholesale.

Reference semantics:
- `yarn/util/Apps.java:274-304 (shouldCountTowardsNodeBlacklisting)`
  — an AM container failure counts against its node UNLESS the exit
  status is SUCCESS(0) or one of the by-design/system classes:
  ABORTED(-100), DISKS_FAILED(-101), PREEMPTED(-102),
  KILLED_EXCEEDED_VMEM(-103), KILLED_EXCEEDED_PMEM(-104),
  KILLED_BY_APPMASTER(-105), KILLED_BY_RESOURCEMANAGER(-106),
  KILLED_AFTER_APP_COMPLETION(-107). INVALID(-1000) and every other
  status COUNT (conservative, per YARN-4284).
- `resourcemanager/rmapp/attempt/RMAppAttemptImpl.java:2013-2015` —
  each counting failure adds the node to the attempt's blacklist.
- `resourcemanager/blacklist/SimpleBlacklistManager.java:64-85
  (getBlacklistUpdates)` — as long as the blacklist stays below
  threshold*clusterHosts the nodes ship as ADDITIONS; once it
  reaches the threshold the whole list ships as REMOVALS (the
  blacklist is disabled — too many nodes failed for per-node
  avoidance to mean anything).

Spark-first scale shape: one distinct + groupBy on (app, node)
behind a single shuffle, an app-level count window on the same key
prefix, and one broadcast scalar (cluster host count) — every
application's blacklist evaluates in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EXEMPT_EXIT_STATUSES = (
    0, -100, -101, -102, -103, -104, -105, -106, -107,
)  # Apps.java:276-294; everything else counts, incl. INVALID -1000


def counts_towards_blacklisting(exit_status) -> F.Column:
    return ~F.col(exit_status).isin(*EXEMPT_EXIT_STATUSES) if isinstance(
        exit_status, str
    ) else ~exit_status.isin(*EXEMPT_EXIT_STATUSES)


def blacklist_updates(
    failures: DataFrame, nodes: DataFrame, disable_threshold: float
) -> DataFrame:
    """Evaluate getBlacklistUpdates for every app at once.

    `failures`: (app_id, node, exit_status int) — AM container finish
    events; `nodes`: (node) — the cluster host registry;
    `disable_threshold`: fraction of cluster hosts at which the
    blacklist disables. Returns one row per blacklisted (app, node):
    the per-node counting-failure count, the app's blacklist size,
    and the shipped action (BLACKLIST_ADDITION / BLACKLIST_REMOVAL
    once disabled)."""
    host_count = nodes.agg(F.countDistinct("node").alias("__hosts"))
    per_node = (
        failures.where(counts_towards_blacklisting("exit_status"))
        .groupBy("app_id", "node")
        .agg(F.count(F.lit(1)).alias("n_failures"))
    )
    size = F.count(F.lit(1)).over(Window.partitionBy("app_id"))
    out = per_node.withColumn("blacklist_size", size).crossJoin(
        F.broadcast(host_count)
    )
    disabled = F.col("blacklist_size") >= F.lit(disable_threshold) * F.col(
        "__hosts"
    )
    return out.select(
        "app_id",
        "node",
        "n_failures",
        F.col("blacklist_size").cast("long").alias("blacklist_size"),
        disabled.alias("disabled"),
        F.when(disabled, F.lit("BLACKLIST_REMOVAL"))
        .otherwise(F.lit("BLACKLIST_ADDITION"))
        .alias("action"),
    )
