"""CapacityScheduler intra-queue app ordering and inter-queue
assignment ordering.

Reference semantics:
- `scheduler/policy/FifoOrderingPolicy.java:36-42` — apps order by
  PriorityComparator then FifoComparator.
  `policy/PriorityComparator.java:31-43` — a null priority sorts
  FIRST; otherwise `Priority.compareTo` (`api/records/
  Priority.java:83-85` returns other-minus-this), i.e. HIGHER
  priority first. `policy/FifoComparator.java:30-33` +
  `SchedulerApplicationAttempt.java:1352-1358` — input order is
  ascending ApplicationId (submission order).
- `scheduler/policy/FairOrderingPolicy.java:55-127` — apps order by
  magnitude ascending (cached used memory for the ANY label; with
  size-based weight enabled the magnitude divides by
  log1p(demand)/log(2), so a zero-demand app's magnitude is Java
  +Infinity — sorts last), then earlier start time, then apps WITH
  demand before zero-demand apps, then FifoComparator. Priority is
  NOT consulted. The used==0 & demand==0 corner yields NaN in the
  reference (its comparator returns 0 through signum(NaN)); we model
  it as +Infinity too — the reference's own ordering there is
  contract-violating and unstable.
- `scheduler/capacity/policy/PriorityUtilizationQueueOrderingPolicy.
  java:70-100 (static compare) + :104-180 (PriorityQueueComparator)`
  — sibling queues order per partition by: accessibility to the
  partition (accessible first; everybody accesses the default
  partition), then zero-absolute-capacity queues last, then the
  priority/utilization interplay over the tier's used metric
  (usedCapacity for configured queues, absoluteUsedCapacity within
  the zero-capacity tier): equal priorities compare used ascending;
  different priorities compare priority descending when both sides
  sit on the same side of 1.0 utilization, and the under-capacity
  queue wins otherwise. That pairwise rule IS the total order
  (under-tier, priority desc, used asc) — proved by case analysis;
  we rank by those keys. Ties fall to configured min resource
  descending then absolute capacity descending; the reference
  compares min resources only when BOTH are configured (pairwise
  intransitive for mixed groups — contract-violating under TimSort),
  so we implement the homogeneous intended case: min-resource key
  first (unset = null, sorted last), absolute capacity after.

Spark-first scale shape: each ranking is row_number window passes
that share ONE partitioning (queue, or parent x partition) — a
single shuffle ranks every queue/parent in parallel; all keys are
codegen'd expressions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_apps(apps: DataFrame) -> DataFrame:
    """Rank pending apps within each queue under BOTH app-ordering
    policies (plus fair with size-based weight).

    `apps`: (queue, app_seq long — ApplicationId submission order,
    priority int nullable, start_time long, used_mb long,
    demand_mb long). Returns the input keys + fifo_rank, fair_rank,
    fair_sbw_rank."""
    by_queue = Window.partitionBy("queue")
    fifo = by_queue.orderBy(
        F.col("priority").desc_nulls_first(), F.col("app_seq").asc()
    )
    mag = F.col("used_mb").cast("double")
    # Java: used / (log1p(demand)/log(2)); zero demand -> +Infinity
    mag_sbw = F.when(
        F.col("demand_mb") == 0, F.lit(float("inf"))
    ).otherwise(
        F.col("used_mb") / (F.log1p(F.col("demand_mb")) / F.log(F.lit(2.0)))
    )
    zero_demand_last = (F.col("demand_mb") == 0).asc()
    fair = by_queue.orderBy(
        mag.asc(), F.col("start_time").asc(), zero_demand_last,
        F.col("app_seq").asc(),
    )
    fair_sbw = by_queue.orderBy(
        mag_sbw.asc(), F.col("start_time").asc(), zero_demand_last,
        F.col("app_seq").asc(),
    )
    return apps.select(
        "queue",
        "app_seq",
        "priority",
        "start_time",
        "used_mb",
        "demand_mb",
        F.row_number().over(fifo).alias("fifo_rank"),
        F.row_number().over(fair).alias("fair_rank"),
        F.row_number().over(fair_sbw).alias("fair_sbw_rank"),
    )


def rank_queues(queues: DataFrame, respect_priority: bool = True) -> DataFrame:
    """Assignment order among sibling queues per partition
    (PriorityUtilizationQueueOrderingPolicy.getAssignmentIterator).

    `queues`: (parent, partition — '' is the default partition,
    queue, accessible bool — precomputed label containment,
    abs_capacity double, used_capacity double, abs_used_capacity
    double, priority int, min_res long — 0/null = not configured).
    Returns keys + the used metric + assignment_rank."""
    metric = F.when(
        F.col("abs_capacity") == 0.0, F.col("abs_used_capacity")
    ).otherwise(F.col("used_capacity"))
    prio = (
        F.col("priority") if respect_priority else F.lit(0)
    )
    order = Window.partitionBy("parent", "partition").orderBy(
        # everybody has access to the default partition
        F.when(F.col("partition") == "", F.lit(True))
        .otherwise(F.col("accessible"))
        .desc(),
        (F.col("abs_capacity") == 0.0).asc(),   # zero-capacity tier last
        (metric >= 1.0).asc(),                  # under-capacity tier first
        prio.desc(),
        metric.asc(),
        F.when(F.col("min_res") > 0, F.col("min_res")).desc_nulls_last(),
        F.col("abs_capacity").desc(),
        F.col("queue").asc(),
    )
    return queues.select(
        "parent",
        "partition",
        "queue",
        metric.alias("used_metric"),
        F.row_number().over(order).alias("assignment_rank"),
    )
