"""Capacity-scheduler allocation planning (reference:
yarn/server/resourcemanager/scheduler/capacity/CapacityScheduler.java —
queues own a GUARANTEED share of the cluster (capacity) and may grow to
an elastic MAXIMUM (maximum-capacity) from other queues' unused share;
within a queue, apps are served in FIFO submission order).

The scheduler's iterative heartbeat loop has a closed form for a single
allocation round, which is what this planner computes — entirely as
window cumsums, no iteration:

  phase 1 (guaranteed): within each queue in app order, an app receives
    min(demand, guaranteed_remaining). Cumulative form: the queue's
    allocated-so-far before app i is min(cum_prev_demand, guaranteed),
    so alloc1_i = clamp(min(demand_i, guaranteed - that), >= 0).
  phase 2 (elastic): residual demands are first capped by the queue's
    elastic headroom (max - phase-1 use) with the same cumulative-min
    trick, then admitted against the CLUSTER's leftover capacity by one
    GLOBAL cumsum in (queue, app) order.

Both phases are data-sized window passes partitioned by queue plus one
ordered pass over the app table (apps ~ thousands — control-plane
scale; the windows never touch task-level data)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def allocate(
    apps: DataFrame,
    queues: DataFrame,
    cluster_total: int,
    app_col: str = "app_id",
    queue_col: str = "queue",
    demand_col: str = "demand",
) -> DataFrame:
    """One allocation round. ``apps``: (app_id, queue, demand);
    ``queues``: (queue, cap_pct, max_pct) with fractions in [0, 1].
    Returns (app_id, queue, demand, alloc_guaranteed, alloc_elastic,
    total_alloc, state FULLY|PARTIAL|PENDING).

    Apps naming a queue absent from ``queues`` are dropped (the real
    scheduler rejects submission to an unknown queue at the RM door;
    validate upstream if you need them surfaced). Guaranteed shares
    must sum to <= 1 — the scheduler refuses configurations whose child
    capacities oversubscribe the parent (CapacityScheduler validates
    this at refresh), and phase 1 would otherwise over-allocate."""
    cap_sum = sum(r.cap_pct for r in queues.select("cap_pct").collect())
    if cap_sum > 1.0 + 1e-9:
        raise ValueError(
            f"queue cap_pct sum {cap_sum:.4f} > 1: guaranteed shares "
            "oversubscribe the cluster (invalid scheduler config)"
        )
    a = apps.join(F.broadcast(queues), queue_col).select(
        app_col,
        queue_col,
        F.lit("").alias("__lbl"),
        F.col(demand_col).cast("long").alias("demand"),
        F.floor(F.lit(cluster_total) * F.col("cap_pct")).alias("guar"),
        F.floor(F.lit(cluster_total) * F.col("max_pct")).alias("qmax"),
        F.lit(cluster_total).cast("long").alias("ctotal"),
    )
    return _two_phase(a, "__lbl", queue_col, app_col).drop("__lbl")


def _two_phase(a: DataFrame, label_col: str, queue_col: str,
               app_col: str) -> DataFrame:
    """The closed-form two-phase allocation round over rows carrying
    (label, queue, app, demand, guar, qmax, ctotal). Every window
    partitions by label: label partitions are INDEPENDENT schedulers
    by construction (RMNodeLabelsManager.getResourceByLabel — each
    partition owns its nodes' resources). allocate() runs it with a
    single '' label."""
    wq = (
        Window.partitionBy(label_col, queue_col)
        .orderBy(app_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    a = a.withColumn(
        "alloc_guaranteed",
        F.greatest(
            F.lit(0),
            F.least(
                F.col("demand"),
                F.col("guar")
                - F.least(
                    F.coalesce(F.sum("demand").over(wq), F.lit(0)),
                    F.col("guar"),
                ),
            ),
        ),
    ).withColumn("resid", F.col("demand") - F.col("alloc_guaranteed"))
    # per-queue phase-1 consumption and elastic headroom
    wq_all = Window.partitionBy(label_col, queue_col)
    a = a.withColumn(
        "headroom",
        F.greatest(
            F.lit(0),
            F.col("qmax") - F.sum("alloc_guaranteed").over(wq_all),
        ),
    )
    # queue-capped elastic candidate (cumulative-min trick on residuals)
    a = a.withColumn(
        "qcand",
        F.greatest(
            F.lit(0),
            F.least(
                F.col("resid"),
                F.col("headroom")
                - F.least(
                    F.coalesce(F.sum("resid").over(wq), F.lit(0)),
                    F.col("headroom"),
                ),
            ),
        ),
    )
    # per-partition admission against the partition's leftover,
    # in (queue, app) order
    leftover = F.col("ctotal") - F.sum("alloc_guaranteed").over(
        Window.partitionBy(label_col)
    )
    wg = (
        Window.partitionBy(label_col)
        .orderBy(queue_col, app_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    a = a.withColumn(
        "alloc_elastic",
        F.greatest(
            F.lit(0),
            F.least(
                F.col("qcand"),
                leftover
                - F.least(
                    F.coalesce(F.sum("qcand").over(wg), F.lit(0)), leftover
                ),
            ),
        ),
    )
    total = F.col("alloc_guaranteed") + F.col("alloc_elastic")
    return a.select(
        app_col,
        queue_col,
        label_col,
        "demand",
        "alloc_guaranteed",
        "alloc_elastic",
        total.alias("total_alloc"),
        F.when(total >= F.col("demand"), "FULLY")
        .when(total > 0, "PARTIAL")
        .otherwise("PENDING")
        .alias("state"),
    )


def label_partition_resources(
    nodes: DataFrame,
    label_col: str = "label",
    resource_col: str = "resource",
) -> DataFrame:
    """`RMNodeLabelsManager.getResourceByLabel` (:515): each label
    partition owns the summed resources of its RUNNING nodes; nodes
    without a label (null or '') form the NO_LABEL partition. nodes:
    (node, label, resource, running bool). One partial-agg groupBy."""
    return (
        nodes.filter(F.col("running"))
        .groupBy(
            F.coalesce(F.col(label_col), F.lit("")).alias("label")
        )
        .agg(F.sum(resource_col).cast("long").alias("cluster_total"))
    )


def allocate_labeled(
    apps: DataFrame,
    queues: DataFrame,
    label_totals: DataFrame,
    app_col: str = "app_id",
    queue_col: str = "queue",
    demand_col: str = "demand",
) -> DataFrame:
    """Node-label-partitioned capacity allocation (reference:
    CommonNodeLabelsManager.java:65 / RMNodeLabelsManager.java:343,515
    — cluster resources PARTITION by node label, queues hold
    per-partition capacities (capacity-scheduler
    accessible-node-labels.<label>.capacity), and the scheduler runs
    the same two-phase guaranteed+elastic round independently inside
    every partition; an app's resource request names its label
    expression).

    apps: (app_id, queue, label, demand) — label '' is the default
    (no-label) partition. queues: (queue, label, cap_pct, max_pct) —
    per-partition shares; guaranteed shares must sum ≤ 1 WITHIN each
    label (validated — the scheduler refuses oversubscribed partition
    configs at refresh). label_totals: (label, cluster_total), e.g.
    from `label_partition_resources`. Output is allocate()'s shape
    plus the label column; windows partition by (label, queue), so
    adding partitions adds parallelism, never a wider shuffle."""
    sums: dict[str, float] = {}
    for r in queues.select("label", "cap_pct").collect():
        sums[r.label] = sums.get(r.label, 0.0) + r.cap_pct
    bad = {k: v for k, v in sums.items() if v > 1.0 + 1e-9}
    if bad:
        raise ValueError(
            f"per-label cap_pct sums exceed 1: {bad} (guaranteed shares "
            "oversubscribe their label partitions)"
        )
    a = (
        apps.join(F.broadcast(queues), [queue_col, "label"])
        .join(F.broadcast(label_totals), "label")
        .select(
            app_col,
            queue_col,
            "label",
            F.col(demand_col).cast("long").alias("demand"),
            F.floor(F.col("cluster_total") * F.col("cap_pct")).alias("guar"),
            F.floor(F.col("cluster_total") * F.col("max_pct")).alias("qmax"),
            F.col("cluster_total").cast("long").alias("ctotal"),
        )
    )
    return _two_phase(a, "label", queue_col, app_col)


def drf_ranking(usage: DataFrame, totals: DataFrame) -> DataFrame:
    """Dominant Resource Fairness scheduling order (reference:
    yarn/server/resourcemanager/scheduler/fair/policies/
    DominantResourceFairnessPolicy.java — each queue's share of every
    resource is computed against the cluster total; its DOMINANT share
    is the max, and the scheduler serves the queue with the LOWEST
    dominant share next, Ghodsi et al. NSDI'11).

    usage: queue, mem_used, vcores_used. totals: ONE-ROW frame with
    mem_total, vcores_total (crossJoined, never collected). Output
    adds mem_share / cpu_share / dominant_share / dominant_resource
    (memory wins exact ties, as the comparator's resource order does)
    and schedule_rank (1 = served next; ties broken by queue name).

    The rank is a queue-count-sized broadcast self-join count rather
    than a global window — no single-partition exchange anywhere."""
    shared = usage.crossJoin(F.broadcast(totals)).select(
        "queue",
        "mem_used",
        "vcores_used",
        (F.col("mem_used") / F.col("mem_total")).alias("mem_share"),
        (F.col("vcores_used") / F.col("vcores_total")).alias("cpu_share"),
    )
    shared = shared.withColumn(
        "dominant_share", F.greatest("mem_share", "cpu_share")
    ).withColumn(
        "dominant_resource",
        F.when(
            F.col("mem_share") >= F.col("cpu_share"), F.lit("memory")
        ).otherwise(F.lit("vcores")),
    )
    other = F.broadcast(
        shared.select(
            F.col("queue").alias("__oq"),
            F.col("dominant_share").alias("__ods"),
        )
    )
    ahead = (
        F.col("__ods") < F.col("dominant_share")
    ) | (
        (F.col("__ods") == F.col("dominant_share"))
        & (F.col("__oq") < F.col("queue"))
    )
    return (
        shared.join(other, ahead, "left")
        .groupBy(
            "queue", "mem_used", "vcores_used", "mem_share", "cpu_share",
            "dominant_share", "dominant_resource",
        )
        .agg((F.count("__oq") + 1).cast("int").alias("schedule_rank"))
    )


def preemption_plan(
    queues: DataFrame, fair_threshold: float = 0.5
) -> DataFrame:
    """Fair-scheduler preemption round (reference: yarn fair
    FairScheduler preemption — FSPreemptionThread/FSAppAttempt: a
    queue below its MIN share past minSharePreemptionTimeout may
    reclaim up to minShare - usage; a queue below
    fairSharePreemptionThreshold * fairShare past the fair timeout may
    reclaim up to fairShare - usage; resources come only from queues
    ABOVE their fair share and a donor is never pushed below it).

    Input per queue: queue, usage, min_share, fair_share, min_starved
    and fair_starved (booleans — the timeouts already elapsed).
    Closed form for one round: deficit = max(min-rule, fair-rule)
    entitlement, surplus = max(0, usage - fair_share); donors give
    proportionally to surplus, scaled by min(1, total_deficit /
    total_surplus) so exactly the needed amount moves when it fits and
    everything available moves when it doesn't (the real thread
    iterates; one proportional round is its fixpoint for a static
    snapshot). Two scalar partial aggs broadcast back — queue-count-
    sized everywhere."""
    d_min = F.when(
        F.col("min_starved"),
        F.greatest(F.col("min_share") - F.col("usage"), F.lit(0.0)),
    ).otherwise(F.lit(0.0))
    d_fair = F.when(
        F.col("fair_starved")
        & (F.col("usage") < F.lit(fair_threshold) * F.col("fair_share")),
        F.greatest(F.col("fair_share") - F.col("usage"), F.lit(0.0)),
    ).otherwise(F.lit(0.0))
    q = queues.withColumn(
        "deficit", F.greatest(d_min, d_fair)
    ).withColumn(
        "surplus",
        F.greatest(F.col("usage") - F.col("fair_share"), F.lit(0.0)),
    )
    totals = q.agg(
        F.sum("deficit").alias("__d"), F.sum("surplus").alias("__s")
    )
    ratio = F.when(
        F.col("__s") > 0, F.least(F.col("__d") / F.col("__s"), F.lit(1.0))
    ).otherwise(F.lit(0.0))
    out = q.crossJoin(F.broadcast(totals)).withColumn(
        "preempt", F.col("surplus") * ratio
    )
    role = (
        F.when(F.col("deficit") > 0, F.lit("STARVED"))
        .when(F.col("preempt") > 0, F.lit("DONOR"))
        .otherwise(F.lit("OK"))
    )
    return out.select(
        "queue",
        "usage",
        "min_share",
        "fair_share",
        F.round("deficit", 4).alias("deficit"),
        F.round("surplus", 4).alias("surplus"),
        F.round("preempt", 4).alias("preempt"),
        role.alias("role"),
    )


def resolve_hierarchy(queues: DataFrame) -> DataFrame:
    """Hierarchical queue-capacity resolution + the configuration
    validations the scheduler runs at init (reference
    capacity/CSQueueUtils.java:120-145 loadCapacitiesByLabelsFromConf
    — configured percentages become fractions; :147-170
    updateAbsoluteCapacitiesByNodeLabels — absoluteCapacity(q,label) =
    capacity * parent's absoluteCapacity, recursively, with a
    capacity of 0 leaving the absolute at 0 and the root's parent
    contributing 1; :62-83 capacitiesSanityCheck — absolute capacity
    must not exceed absolute maximum capacity; and
    capacity/ParentQueue.java:195-236 — per (parent, label), children
    capacities must sum to 1 within PRECISION = 0.0005 when the
    parent's capacity is positive, and must be 0 when it is 0).

    `queues`: (queue_path dotted 'root.a.b', label — '' default,
    capacity double PERCENT, max_capacity double PERCENT). Returns
    per (queue, label): absolute capacity/max (round 6), the
    children's capacity sum (null on leaves), and the verdict
    OK / ILLEGAL_CHILDREN_SUM / ILLEGAL_ABS_GT_MAX.

    Spark-first scale shape: the recursion is a prefix-chain explode
    (depth-bounded, same shape as the encryption-zone walk) joined
    back to the per-queue config — the path product is
    exp(sum(ln)) under a min-capacity>0 gate — plus one
    parent-keyed children rollup. Two shuffles on (queue, label);
    queue trees are config-sized but the plan would hold at any
    fan-out."""
    # one evaluation of the queue-config derivation (r14): `queues` is
    # consumed by the prefix chain, the ancestor caps, the child sums
    # and the own-capacity join; without the lineage cut Catalyst
    # re-inlines the caller's derivation into all four
    queues = queues.localCheckpoint(eager=False)
    parts = F.split(F.col("queue_path"), "\\.")
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, 1, i), "."),
    )
    chain = queues.select(
        "queue_path",
        "label",
        F.explode(prefixes).alias("__anc"),
    )
    caps = queues.select(
        F.col("queue_path").alias("__anc"),
        "label",
        (F.col("capacity") / 100).alias("__c"),
        (F.col("max_capacity") / 100).alias("__m"),
    )
    rolled = (
        chain.join(caps, ["__anc", "label"])
        .groupBy("queue_path", "label")
        .agg(
            F.min("__c").alias("__minc"),
            F.sum(F.log(F.when(F.col("__c") > 0, F.col("__c")))).alias(
                "__slc"
            ),
            F.min("__m").alias("__minm"),
            F.sum(F.log(F.when(F.col("__m") > 0, F.col("__m")))).alias(
                "__slm"
            ),
        )
    )
    abs_cap = F.when(
        F.col("__minc") > 0, F.exp(F.col("__slc"))
    ).otherwise(F.lit(0.0))
    abs_max = F.when(
        F.col("__minm") > 0, F.exp(F.col("__slm"))
    ).otherwise(F.lit(0.0))
    parent_of = F.when(
        F.col("queue_path").contains("."),
        F.regexp_replace("queue_path", "\\.[^.]+$", ""),
    )
    child_sums = (
        queues.select(
            parent_of.alias("queue_path"),
            "label",
            (F.col("capacity") / 100).alias("__cc"),
        )
        .where(F.col("queue_path").isNotNull())
        .groupBy("queue_path", "label")
        .agg(F.sum("__cc").alias("__csum"))
    )
    out = (
        rolled.join(child_sums, ["queue_path", "label"], "left")
        .join(
            queues.select(
                "queue_path", "label",
                (F.col("capacity") / 100).alias("__own"),
            ),
            ["queue_path", "label"],
        )
    )
    bad_children = F.col("__csum").isNotNull() & (
        ((F.col("__own") > 0)
         & (F.abs(F.lit(1.0) - F.col("__csum")) > 0.0005))
        | ((F.col("__own") == 0) & (F.col("__csum") > 0))
    )
    r_abs = F.round(abs_cap, 6)
    r_max = F.round(abs_max, 6)
    verdict = (
        F.when(bad_children, F.lit("ILLEGAL_CHILDREN_SUM"))
        .when(r_abs > r_max, F.lit("ILLEGAL_ABS_GT_MAX"))
        .otherwise(F.lit("OK"))
    )
    return out.select(
        "queue_path",
        "label",
        r_abs.alias("abs_capacity"),
        r_max.alias("abs_max_capacity"),
        F.round("__csum", 6).alias("children_sum"),
        verdict.alias("verdict"),
    )
