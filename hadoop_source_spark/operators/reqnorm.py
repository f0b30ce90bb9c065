"""Resource-request normalization + validation: the first gate every
scheduler request passes through in the reference RM.

Reference semantics
(`hadoop-yarn-server-resourcemanager/.../scheduler/SchedulerUtils.java`):

- ``normalizeAndValidateRequest:265-293`` check order: the
  labels-disabled rejection first (:266-281, any non-empty label
  expression while node labels are off), then label normalization,
  then ``validateResourceRequest``.
- ``normalizeNodeLabelExpressionInRequest:231-263``: a null label on
  a ``resourceName == ANY ('*')`` request inherits the queue's
  default expression; any label still null becomes NO_LABEL ("") —
  including on non-ANY requests. BOTH steps are guarded on
  ``queueInfo != null`` (:240, :250-252): a dynamic queue's null
  label stays null.
- ``validateResourceRequest:332-375`` +
  ``checkResourceRequestAgainstAvailableResource:395-413``: per
  countable dimension IN INDEX ORDER (memory before vcores),
  LESS_THAN_ZERO before GREATER_THEN_MAX_ALLOCATION; then non-empty
  label on a non-ANY resource name (:346-354), then multi-label
  ``&&`` (:356-359), then queue accessibility
  (``checkQueueLabelExpression:533-551``: null accessible-set
  rejects, the ANY ('*') entry admits everything), then cluster
  membership (``checkQueueLabelInLabelManager:516-527``).
- Capability normalization (``normalizeRequest:201-210`` →
  ``DominantResourceCalculator.normalize:447-470``): per dimension
  ``min(roundUp(max(value, minimum), step), maximum)`` with a zero
  step skipping the round-up; validation sees the RAW ask, so a
  round-up past the max clamps instead of rejecting.

Spark-first: one broadcast join to the conf-sized queue table plus a
single codegen when-chain — no shuffle on the request side at all; a
billion requests normalize map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ANY = "*"


def _round_up(v: Column, step: int) -> Column:
    if step == 0:
        return v
    return F.floor((v + (step - 1)) / step) * step


def normalize_requests(
    requests: DataFrame,
    queues: DataFrame,
    *,
    min_mem: int,
    max_mem: int,
    inc_mem: int,
    min_vcores: int,
    max_vcores: int,
    inc_vcores: int,
    labels_enabled: bool,
    cluster_labels: list[str],
) -> DataFrame:
    """Validate and normalize resource requests.

    ``requests``: (req_id long, queue string, resource_name string —
    '*' is ANY, mem long, vcores long, label string nullable).
    ``queues``: (queue, default_label string nullable, accessible
    string nullable — comma-separated label set, '*' admits all,
    NULL rejects all).

    Returns (req_id, verdict, effective_label, norm_mem, norm_vcores);
    the norm columns are NULL on rejected requests, and
    effective_label is the post-normalization expression (the raw one
    for the labels-disabled rejection, which fires first).

    A request naming a queue absent from ``queues`` (a dynamic queue,
    ``queueInfo == null`` in the reference) skips the accessibility
    and cluster-membership checks entirely
    (``validateResourceRequest:360-374`` guards both on
    ``null != queueInfo``) — it is not rejected."""
    req = requests.join(
        F.broadcast(queues.withColumn("_queue_known", F.lit(True))),
        "queue",
        "left",
    )
    raw_label = F.col("label")
    has_raw = raw_label.isNotNull() & (F.trim(raw_label) != "")
    known = F.col("_queue_known").isNotNull()

    # normalizeNodeLabelExpressionInRequest:231-263: both the
    # queue-default inheritance and the NO_LABEL ("") fallback are
    # guarded on queueInfo != null (:240, :250-252) — a dynamic
    # queue's null label passes through as NULL, not "".
    eff = (
        F.when(raw_label.isNotNull(), raw_label)
        .when(
            known & (F.col("resource_name") == ANY),
            F.coalesce(F.col("default_label"), F.lit("")),
        )
        .when(known, F.lit(""))
    )
    has_eff = F.trim(eff) != ""

    acc = F.col("accessible")
    accessible = acc.isNotNull() & (
        F.array_contains(F.split(acc, ","), F.trim(eff))
        | F.array_contains(F.split(acc, ","), F.lit(ANY))
    )
    in_cluster = F.trim(eff).isin(*cluster_labels) if cluster_labels else (
        F.lit(False)
    )

    verdict = (
        F.when(~F.lit(labels_enabled) & has_raw, "INVALID_LABEL_DISABLED")
        .when(F.col("mem") < 0, "LESS_THAN_ZERO_MEMORY")
        .when(F.col("mem") > max_mem, "GREATER_THAN_MAX_MEMORY")
        .when(F.col("vcores") < 0, "LESS_THAN_ZERO_VCORES")
        .when(F.col("vcores") > max_vcores, "GREATER_THAN_MAX_VCORES")
        .when(
            (F.col("resource_name") != ANY) & has_raw,
            "INVALID_LABEL_ON_NON_ANY",
        )
        .when(eff.contains("&&"), "INVALID_MULTI_LABEL")
        .when(
            F.col("_queue_known").isNotNull() & has_eff & ~accessible,
            "INVALID_LABEL_NOT_ACCESSIBLE",
        )
        .when(
            F.col("_queue_known").isNotNull() & has_eff & ~in_cluster,
            "INVALID_LABEL_NOT_IN_CLUSTER",
        )
        .otherwise("OK")
    )
    ok = verdict == "OK"
    norm_mem = F.least(
        _round_up(F.greatest(F.col("mem"), F.lit(min_mem)), inc_mem),
        F.lit(max_mem),
    )
    norm_vcores = F.least(
        _round_up(F.greatest(F.col("vcores"), F.lit(min_vcores)), inc_vcores),
        F.lit(max_vcores),
    )
    return req.select(
        "req_id",
        verdict.alias("verdict"),
        F.when(
            verdict == "INVALID_LABEL_DISABLED", F.coalesce(raw_label, eff)
        )
        .otherwise(eff)
        .alias("effective_label"),
        F.when(ok, norm_mem).cast("long").alias("norm_mem"),
        F.when(ok, norm_vcores).cast("long").alias("norm_vcores"),
    )
