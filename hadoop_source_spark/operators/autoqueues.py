"""Auto-created leaf queues: the CapacityScheduler's managed-parent
template resolution and the guaranteed-or-zero-capacity-over-time
management policy — which dynamic leaves a management tick activates
(template capacity) and which it parks at zero.

Reference semantics (`hadoop-yarn-server-resourcemanager/.../scheduler/
capacity/queuemanagement/GuaranteedOrZeroCapacityOverTimePolicy.java`):

- Per template node label (``computeQueueManagementChanges:356-470``):
  1. DEACTIVATE every currently-active leaf with zero applications
     (``deactivateLeafQueuesIfInActive:583-610``,
     ``hasPendingApps:717-719`` — getNumApplications() > 0); its
     entitlement drops to zero capacity while keeping the template's
     maximum (``updateToZeroCapacity:796-801``).
  2. available = parent's absolute capacity − the activated-children
     running total (count of active leaves × the template's absolute
     capacity, maintained by ``activate``/``deactivate``:690-715)
     + the capacity just deactivated + EPSILON
     (``CSQueueUtils.EPSILON = 0.0001f``, :404-405).
  3. When available >= the template's absolute capacity and
     applications are pending: activate up to
     ``floor(available / template_abs)`` leaves, capped by the number
     of pending applications (``getMaxLeavesToBeActivated:627-639``);
     candidate leaves are walked in application submit-time order
     (``PendingApplicationComparator:271-292`` over
     ``getAllApplications``, :834-840), skipping leaves already
     active, just-deactivated, or already chosen
     (``getSortedLeafQueues:534-559``). An activated leaf's
     entitlement is the full template capacity
     (``updateCapacityFromTemplate:803-809``).
- Queue-creation templates (``getInitialLeafQueueConfiguration:
  755-793``): a brand-new dynamic leaf activates immediately when
  parent_abs − activated_total + EPSILON >= template_abs, else it is
  born at zero capacity.

Spark-first: per-(parent, label) aggregates for the activated /
deactivated totals, one rank window on (parent, label) keyed by each
candidate queue's earliest submit time for the activation walk, and
broadcast-sized joins — the leaf population shuffles once on the
parent grain; no driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EPSILON = 0.0001

ACTIVATE = "ACTIVATE"
DEACTIVATE = "DEACTIVATE"


def queue_management_changes(
    parents: DataFrame, leaves: DataFrame, apps: DataFrame
) -> DataFrame:
    """One management tick over every managed parent.

    ``parents``: (parent_path, label, parent_abs double, template_abs
    double, template_cap double, template_max double) — the managed
    parent's absolute capacity and the leaf template's absolute,
    relative and maximum capacities per template node label (the
    availability math runs on ABSOLUTE capacities, :376-417, while
    the entitlement written back carries the template's RELATIVE
    capacity, ``updateCapacityFromTemplate:803-809``).
    ``leaves``: (parent_path, queue_path, label, is_active boolean,
    num_apps long) — current auto-created leaf state per label.
    ``apps``: (parent_path, queue_path, app_id, submit_time long) —
    the parent's applications (getAllApplications).

    Returns (parent_path, queue_path, label, action ACTIVATE |
    DEACTIVATE, capacity double — the new entitlement's capacity,
    max_capacity double)."""
    # Lineage cuts (r14, guide §5): parents/leaves are each consumed
    # three times below (lv feeds deact AND totals; leaves again in the
    # candidate walk; parents again in avail) and Catalyst re-inlines
    # their whole upstream derivation per consumer — the auto_queue
    # workload's distinct-of-scan input showed 11 source scans in one
    # plan. Both tables are queue-state-sized by contract (leaves per
    # managed parent), so cutting at entry is control-plane cheap.
    parents = parents.localCheckpoint(eager=False)
    leaves = leaves.localCheckpoint(eager=False)
    # step 1: deactivations + per-(parent,label) running totals
    lv = leaves.join(parents, ["parent_path", "label"])
    deact = lv.where(F.col("is_active") & (F.col("num_apps") <= 0))
    totals = lv.groupBy("parent_path", "label").agg(
        F.sum(
            F.when(F.col("is_active"), F.col("template_abs")).otherwise(
                0.0
            )
        ).alias("activated_total"),
        F.sum(
            F.when(
                F.col("is_active") & (F.col("num_apps") <= 0),
                F.col("template_abs"),
            ).otherwise(0.0)
        ).alias("deactivated_total"),
    )
    # ONE pass over the (corpus-sized) apps table: the per-queue
    # aggregate serves both consumers — the parent-level pending count
    # is the exact sum of per-queue counts, and the candidate walk
    # needs the per-queue earliest submit. Before: two independent
    # groupBys each re-evaluated the full apps derivation (guide §1.2).
    q_agg = apps.groupBy("parent_path", "queue_path").agg(
        F.count(F.lit(1)).alias("__napps"),
        F.min("submit_time").alias("first_submit"),
    ).localCheckpoint(eager=False)
    pending_cnt = q_agg.groupBy("parent_path").agg(
        F.sum("__napps").alias("pending_apps")
    )
    avail = (
        parents.join(totals, ["parent_path", "label"], "left")
        .join(pending_cnt, "parent_path", "left")
        .select(
            "parent_path", "label", "template_abs", "template_cap",
            "template_max",
            (
                F.col("parent_abs")
                - F.coalesce(F.col("activated_total"), F.lit(0.0))
                + F.coalesce(F.col("deactivated_total"), F.lit(0.0))
                + F.lit(EPSILON)
            ).alias("available"),
            F.coalesce(F.col("pending_apps"), F.lit(0)).alias(
                "pending_apps"
            ),
        )
        .withColumn(
            "max_activate",
            F.when(
                (F.col("available") >= F.col("template_abs"))
                & (F.col("template_abs") > 0),
                F.least(
                    F.floor(F.col("available") / F.col("template_abs")),
                    F.col("pending_apps"),
                ),
            ).otherwise(F.lit(0)),
        )
    )
    # step 3: candidate walk — each queue enters at its EARLIEST app's
    # submit time; active and just-deactivated leaves are skipped
    cand = (
        q_agg.select("parent_path", "queue_path", "first_submit")
        .join(
            leaves.where(~F.col("is_active")).select(
                "parent_path", "queue_path", "label"
            ),
            ["parent_path", "queue_path"],
        )
        .join(
            deact.select(
                "parent_path", "queue_path", "label",
                F.lit(True).alias("_deact"),
            ),
            ["parent_path", "queue_path", "label"],
            "left",
        )
        .where(F.col("_deact").isNull())
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("parent_path", "label").orderBy(
                    "first_submit", "queue_path"
                )
            ),
        )
    )
    activated = cand.join(avail, ["parent_path", "label"]).where(
        F.col("rk") <= F.col("max_activate")
    ).select(
        "parent_path", "queue_path", "label",
        F.lit(ACTIVATE).alias("action"),
        F.col("template_cap").alias("capacity"),
        F.col("template_max").alias("max_capacity"),
    )
    deactivated = deact.select(
        "parent_path", "queue_path", "label",
        F.lit(DEACTIVATE).alias("action"),
        F.lit(0.0).alias("capacity"),
        F.col("template_max").alias("max_capacity"),
    )
    return deactivated.unionByName(activated)


def initial_leaf_template(
    parents: DataFrame, leaves: DataFrame, new_queues: DataFrame
) -> DataFrame:
    """getInitialLeafQueueConfiguration:755-793 — the template a
    brand-new dynamic leaf is born with, per label.

    ``new_queues``: (parent_path, queue_path). Returns (parent_path,
    queue_path, label, activated boolean, capacity, max_capacity)."""
    activated_total = (
        leaves.join(parents, ["parent_path", "label"])
        .groupBy("parent_path", "label")
        .agg(
            F.sum(
                F.when(F.col("is_active"), F.col("template_abs"))
                .otherwise(0.0)
            ).alias("activated_total")
        )
    )
    base = (
        new_queues.join(parents, "parent_path")
        .join(activated_total, ["parent_path", "label"], "left")
    )
    fits = (
        F.col("parent_abs")
        - F.coalesce(F.col("activated_total"), F.lit(0.0))
        + F.lit(EPSILON)
        >= F.col("template_abs")
    )
    return base.select(
        "parent_path", "queue_path", "label",
        fits.alias("activated"),
        F.when(fits, F.col("template_cap")).otherwise(0.0).alias(
            "capacity"
        ),
        F.col("template_max").alias("max_capacity"),
    )
