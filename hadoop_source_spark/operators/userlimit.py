"""CapacityScheduler per-user limit computation — the headroom figure
behind every "why is my app stuck at X%" question.

Reference semantics (`hadoop-yarn-server-resourcemanager/.../capacity/
UsersManager.java:705-829` computeUserLimit, single-dimension
DefaultResourceCalculator arithmetic per
`DefaultResourceCalculator.java:71-127` and
`ResourceCalculator.java:78-124`):

- queueCapacity = max(effectiveCapacity, minimumAllocation) — the
  miniscule-queue progress guarantee (:727-729).
- consumed = roundUp((long)(partitionResource x usageRatio + 0.5),
  minAlloc) (multiplyAndNormalizeUp :746-748; the usage ratio is the
  SUM of per-user dominant shares and may exceed 1).
- currentCapacity = consumed < queueCapacity ? queueCapacity
  : consumed + required, with required = minAlloc (:749-752).
- resourceUsed / divisor: an ACTIVE-user computation uses (used by
  active users + required) / activeUsersTimesWeights; a non-active
  one uses currentCapacity / allUsersTimesWeights (:759-768).
- userLimit = max(divideAndCeil(resourceUsed, weights) — float
  division then ceil (:85-90) —, divideAndCeil((long)(currentCapacity
  x ulPercent), 100) — integer ceil-div (:78-83)) (:774-780).
- maxUserLimit = RESPECT_PARTITION_EXCLUSIVITY ?
  (long)(queueCapacity x userLimitFactor) : partitionResource
  (:792-798); final = roundUp(min(userLimit, maxUserLimit),
  minAlloc) (:801-805).

Deviation note: Java's float-path divideAndCeil runs in float32; this
plan (and the oracle) computes it in float64 — identical whenever the
divisor is integer-valued (the weights the RM actually produces for
unweighted users), which the driver derivation pins.

Scale shape: ONE codegen projection — no joins, no shuffles; a
million (queue, partition, user-class) rows compute map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ceil_div(a: Column, b: Column) -> Column:
    """ResourceCalculator.divideAndCeil(long, long): (a + b - 1) / b."""
    return F.floor((a + b - 1) / b).cast("long")


def compute_user_limits(rows: DataFrame) -> DataFrame:
    """One user-limit computation per row.

    Input columns: partition_resource, effective_capacity, min_alloc
    (all long, memory MB), usage_ratio double, active_used long,
    active_weights double, all_weights double, ul_percent long (the
    minimum-user-limit-percent), ul_factor double, respect_exclusivity
    boolean, active_user boolean, plus any id columns (passed
    through). Output adds queue_capacity, consumed, current_capacity,
    user_limit_resource (pre-cap), max_user_limit, user_limit."""
    min_alloc = F.col("min_alloc")
    queue_cap = F.greatest(F.col("effective_capacity"), min_alloc)
    consumed = (
        _ceil_div(
            F.floor(
                F.col("partition_resource") * F.col("usage_ratio") + 0.5
            ).cast("long"),
            min_alloc,
        )
        * min_alloc
    )
    current_cap = F.when(consumed < queue_cap, queue_cap).otherwise(
        consumed + min_alloc
    )
    resource_used = F.when(
        F.col("active_user"), F.col("active_used") + min_alloc
    ).otherwise(current_cap)
    weights = F.when(
        F.col("active_user"), F.col("active_weights")
    ).otherwise(F.col("all_weights"))
    by_share = F.ceil(resource_used / weights).cast("long")
    by_percent = _ceil_div(
        F.floor(current_cap * F.col("ul_percent")).cast("long"), F.lit(100)
    )
    ulr = F.greatest(by_share, by_percent)
    max_ul = F.when(
        F.col("respect_exclusivity"),
        F.floor(queue_cap * F.col("ul_factor")).cast("long"),
    ).otherwise(F.col("partition_resource"))
    final = _ceil_div(F.least(ulr, max_ul), min_alloc) * min_alloc
    return rows.select(
        "*",
        queue_cap.cast("long").alias("queue_capacity"),
        consumed.cast("long").alias("consumed"),
        current_cap.cast("long").alias("current_capacity"),
        ulr.cast("long").alias("user_limit_resource"),
        max_ul.cast("long").alias("max_user_limit"),
        final.cast("long").alias("user_limit"),
    )


def compute_headroom(rows: DataFrame) -> DataFrame:
    """Application headroom from a computed user limit
    (`LeafQueue.java:1458-1505` getHeadroom): min(userLimit -
    userUsed, queueCurrentLimit - queueUsed) with BOTH differences
    clamped at zero (subtractNonNegative), rounded DOWN to the
    minimum allocation — and only THEN min'd with the partition's
    free resource (a plain subtract: an over-committed partition
    yields a negative cap, kept faithfully), so the final figure can
    be a non-multiple of minAlloc or negative.

    Input columns: user_limit, user_used, queue_current_limit,
    queue_used, cluster_partition_resource, cluster_used, min_alloc
    (+ ids passed through). Adds headroom_rounded (pre-cluster cap)
    and headroom. One codegen projection, zero shuffles."""
    capped = F.least(
        F.greatest(F.col("user_limit") - F.col("user_used"), F.lit(0)),
        F.greatest(
            F.col("queue_current_limit") - F.col("queue_used"), F.lit(0)
        ),
    )
    rounded = (
        F.floor(capped / F.col("min_alloc")) * F.col("min_alloc")
    )
    cluster_free = F.col("cluster_partition_resource") - F.col(
        "cluster_used"
    )
    return rows.select(
        "*",
        rounded.cast("long").alias("headroom_rounded"),
        F.least(rounded, cluster_free).cast("long").alias("headroom"),
    )
