"""NM container memory enforcement: the polling check that kills
containers exceeding their memory limits — the mechanics behind every
"container killed: exceeded virtual/physical memory" failure.

Reference semantics
(`hadoop-yarn-server-nodemanager/.../monitor/ContainersMonitorImpl.java`):

- ``checkLimit:724-758``: under cgroup strict enforcement WITHOUT
  elastic memory control the polling check is skipped entirely — the
  kernel OOM killer owns the limit (:735-744).
- ``isProcessTreeOverLimit:458-479``: a tree is over limit when its
  CURRENT usage exceeds TWICE the limit, or when the usage of
  processes OLDER THAN ONE MONITORING ITERATION exceeds the limit —
  a fresh spike below 2x gets one iteration of grace (processes
  begin at age 1, :481-489).
- The VIRTUAL check runs first (aged usage = vmem age-1) and kills
  with KILLED_EXCEEDED_VMEM (-103); only then the PHYSICAL check
  (aged usage = RSS age-1) with KILLED_EXCEEDED_PMEM (-104)
  (:749-789). Each check only runs when its conf flag is on. The
  reported delta is current usage minus the limit (:762, :779).

Spark-first: one codegen projection — no joins, no shuffles; a
million container ticks evaluate map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KILLED_EXCEEDED_VMEM = -103
KILLED_EXCEEDED_PMEM = -104

SKIP_CGROUP_OOM = "SKIP_CGROUP_OOM"
KILL = "KILL_CONTAINER"
GRACE = "OVER_LIMIT_GRACE"
WITHIN = "WITHIN_LIMITS"


def _over(current: Column, aged: Column, limit: Column) -> Column:
    return (current > 2 * limit) | (aged > limit)


def check_memory_limits(
    ticks: DataFrame,
    *,
    vmem_check: bool = True,
    pmem_check: bool = True,
) -> DataFrame:
    """Evaluate one monitoring tick per row.

    ``ticks``: (container_id, vmem_usage, vmem_aged, pmem_usage,
    rss_aged, vmem_limit, pmem_limit — longs, plus strict_enforcement
    / elastic_memory booleans). Returns container_id + action,
    over_dim, exit_status, delta (current minus limit of the killed
    dimension). OVER_LIMIT_GRACE marks a surviving tick whose current
    usage exceeds an enabled limit (the reference's benefit-of-doubt
    iteration) — an observability enrichment, not a kill."""
    skip = F.col("strict_enforcement") & ~F.col("elastic_memory")
    v_over = F.lit(vmem_check) & _over(
        F.col("vmem_usage"), F.col("vmem_aged"), F.col("vmem_limit")
    )
    p_over = F.lit(pmem_check) & _over(
        F.col("pmem_usage"), F.col("rss_aged"), F.col("pmem_limit")
    )
    graced = (
        F.lit(vmem_check) & (F.col("vmem_usage") > F.col("vmem_limit"))
    ) | (F.lit(pmem_check) & (F.col("pmem_usage") > F.col("pmem_limit")))
    action = (
        F.when(skip, F.lit(SKIP_CGROUP_OOM))
        .when(v_over | p_over, F.lit(KILL))
        .when(graced, F.lit(GRACE))
        .otherwise(F.lit(WITHIN))
    )
    over_dim = F.when(~skip & v_over, F.lit("virtual")).when(
        ~skip & p_over, F.lit("physical")
    )
    exit_status = F.when(
        ~skip & v_over, F.lit(KILLED_EXCEEDED_VMEM)
    ).when(~skip & p_over, F.lit(KILLED_EXCEEDED_PMEM))
    delta = F.when(
        ~skip & v_over, F.col("vmem_usage") - F.col("vmem_limit")
    ).when(~skip & p_over, F.col("pmem_usage") - F.col("pmem_limit"))
    return ticks.select(
        "container_id",
        action.alias("action"),
        over_dim.alias("over_dim"),
        exit_status.cast("int").alias("exit_status"),
        delta.cast("long").alias("delta"),
    )
