"""FairScheduler starvation detection: which applications the
preemption thread considers starved, and by how much — fairshare
starvation per app plus the queue's minshare starvation distributed
over its demanding apps.

Reference semantics (`hadoop-yarn-server-resourcemanager/.../fair/`):

- ``FSAppAttempt.fairShareStarvation:1158-1181``: fairDemand =
  min(fairShare x fairSharePreemptionThreshold, demand); an app whose
  usage sits strictly below fairDemand for longer than the
  fairshare-preemption timeout is starved by (fairDemand - usage);
  dipping back above the share resets the clock.
- ``FSLeafQueue.updateStarvedAppsFairshare:214-228``: the walk over
  demand-sorted apps BREAKS at the first zero starvation — later apps
  are neither listed nor summed this round (their stored starvation
  stays none; this plan models one update pass from a clean slate).
- ``FSLeafQueue.minShareStarvation:583-604``: queue minshare
  starvation = max(min(minShare, demand) - usage, 0), zeroed until
  the minshare-preemption timeout elapses; ``updateStarvedApps:283-298``
  subtracts the fairshare sum, then
  ``updateStarvedAppsMinshare:235-262`` walks the same order with a
  decrementing ``pending``: each app takes appMinShare =
  max(pendingDemand - fairshareStarvation, 0); an app LARGER than the
  remaining pending is assigned the OVERSHOOT (appMinShare - pending
  — the reference's arithmetic, kept faithfully) and zeroes pending;
  apps reached with pending exhausted are reset.

Closed form: the sequential pending walk is one exclusive prefix sum
— after the overshoot app the prefix exceeds the budget, so
``pending = P0 - prefix <= 0`` self-selects the reset branch (same
monotone-stop family as ramdisk/localcache). Two windows and one
broadcast queue join, everything keyed on the queue — any number of
queues in parallel, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def starvation_report(
    apps: DataFrame, queues: DataFrame, *, now_ms: int
) -> DataFrame:
    """One update pass.

    ``apps``: (queue, app_id, app_rank int — the scheduling-policy
    comparator order, fair_share long, demand long, usage long,
    last_at_fair long ms). ``queues``: (queue, min_share long,
    q_demand long, q_usage long, last_at_min long, fs_timeout long,
    ms_timeout long, fs_threshold double).

    Returns per app: fairshare_starvation, minshare_starvation,
    fs_listed, in_starved_list."""
    threshold = F.floor(
        F.col("fair_share") * F.col("fs_threshold")
    ).cast("long")
    fair_demand = F.least(threshold, F.col("demand"))
    starved_now = F.col("usage") < fair_demand
    fs_raw = F.when(
        starved_now
        & (now_ms - F.col("last_at_fair") >= F.col("fs_timeout")),
        F.greatest(fair_demand - F.col("usage"), F.lit(0)),
    ).otherwise(F.lit(0))
    pending_demand = F.greatest(F.col("demand") - F.col("usage"), F.lit(0))

    wq = Window.partitionBy("queue")
    staged = (
        apps.join(F.broadcast(queues), "queue")
        .withColumn("__has_demand", pending_demand > 0)
        .withColumn(
            "__fs_raw", F.when(F.col("__has_demand"), fs_raw)
        )
        .withColumn(
            "__brk",
            F.min(
                F.when(F.col("__fs_raw") == 0, F.col("app_rank"))
            ).over(wq),
        )
        .withColumn(
            "__fs_eff",
            F.when(
                F.col("__brk").isNotNull()
                & (F.col("app_rank") > F.col("__brk")),
                F.lit(0),
            ).otherwise(F.coalesce(F.col("__fs_raw"), F.lit(0))),
        )
        .withColumn(
            "__fs_listed",
            F.col("__has_demand")
            & (F.col("__fs_raw") > 0)
            & (
                F.col("__brk").isNull()
                | (F.col("app_rank") < F.col("__brk"))
            ),
        )
    )
    fs_sum = F.sum(
        F.when(F.col("__fs_listed"), F.col("__fs_raw")).otherwise(F.lit(0))
    ).over(wq)
    q_ms_raw = F.greatest(
        F.least(F.col("min_share"), F.col("q_demand")) - F.col("q_usage"),
        F.lit(0),
    )
    q_ms = F.when(
        now_ms - F.col("last_at_min") >= F.col("ms_timeout"), q_ms_raw
    ).otherwise(F.lit(0))
    p0 = F.greatest(q_ms - fs_sum, F.lit(0))
    ams = F.when(
        F.col("__has_demand"),
        F.greatest(
            F.greatest(F.col("demand") - F.col("usage"), F.lit(0))
            - F.col("__fs_eff"),
            F.lit(0),
        ),
    ).otherwise(F.lit(0))
    prefix = F.coalesce(
        F.sum(ams).over(
            wq.orderBy("app_rank").rowsBetween(
                Window.unboundedPreceding, -1
            )
        ),
        F.lit(0),
    )
    pend = p0 - prefix
    processed = F.col("__has_demand") & (pend > 0)
    assigned = F.when(
        processed,
        F.when(ams > pend, ams - pend).otherwise(ams),
    ).otherwise(F.lit(0))
    return staged.select(
        "queue",
        "app_id",
        "app_rank",
        F.col("__fs_eff").cast("long").alias("fairshare_starvation"),
        assigned.cast("long").alias("minshare_starvation"),
        F.col("__fs_listed").alias("fs_listed"),
        (F.col("__fs_listed") | processed).alias("in_starved_list"),
    )
