"""CapacityScheduler absolute-resource mode: effective min/max
resources per queue, the scarcity scale-down, and the derived float
capacities + application limits.

Reference semantics (`.../scheduler/capacity/ParentQueue.java`):

- ``updateEffectiveResources:948-1039``: each parent sums its direct
  children's CONFIGURED minimums per label; when the parent's own
  effective minimum (the label resource at root) is smaller than
  that sum, a per-resource-unit ratio numerator/denominator scales
  every child down (``getEffectiveMinRatioPerResource:1065-1086`` —
  a dimension with zero configured sum gets NO ratio and passes
  through); ``getMinResourceNormalized:1041-1063`` multiplies by the
  FLOAT ratio and truncates to long.
- Effective max (:996-1016): the candidate is the child's configured
  max, or the parent's max when unset (parent's configured max,
  falling back to the parent's effective max); the result is
  ``Resources.min`` of candidate and parent max — a WHOLE-resource
  pick under the resource calculator, not a componentwise min. The
  engine implements DefaultResourceCalculator (memory-ordered
  compare/divide), documented.
- ``deriveCapacityFromAbsoluteConfigurations:1088-1121``: float
  capacity = childEffMin / parentEffMin, max-capacity likewise over
  effective max, absolute capacities multiply down the tree.
- Leaf application limits (:1122-1145): an explicit per-queue
  maximum wins; else global-max-apps-per-queue > 0 scales by
  absolute capacity; else the system maximum does; the per-user
  limit is ``min(maxApps, maxApps * userLimit/100 *
  userLimitFactor)`` truncated.
- Percentage-mode children take the :1022-1027 else branch:
  effective min/max = label resource x configured absolute
  (max-)capacity, with their float capacities untouched.

Spark-first: the recursion is level-by-level down the tree — one
(cluster, label, parent)-keyed sum plus one join per level, with the
loop bound by the HIERARCHY DEPTH (operationally tiny), never by
data size; every exchange is keyed on the (cluster, label, queue)
family."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def effective_resources(
    queues: DataFrame,
    clusters: DataFrame,
    *,
    global_max_apps_per_queue: int,
    max_system_apps: int,
) -> DataFrame:
    """``queues``: (cluster_id, label, path — dot-separated, parent
    — null for root, mode 'absolute'|'percentage', min_mem long,
    min_vcores long, max_mem long?, max_vcores long? — null = no
    configured max, pct_abs_capacity double?, pct_abs_max_capacity
    double? — percentage-mode fractions, is_leaf boolean,
    max_apps_conf int — negative = unset, user_limit double,
    user_limit_factor double). ``clusters``: (cluster_id, label,
    mem long, vcores long) — the per-label resource.

    Returns per queue: effective min/max, float capacity /
    max_capacity / absolute capacities, and leaf app limits."""
    # Materialize the queue-conf input once (r14): the level loop
    # consumes `queues` in every level's joins plus the final app-limit
    # join (~2 per level + 2), and Catalyst re-inlines its whole
    # lineage — for the events-derived workload input that was 7 full
    # scans per run. The depth probe below evaluates it anyway, so the
    # eager checkpoint adds no extra pass; it is recomputed from the
    # source on every invocation (no cross-run caching).
    queues = queues.localCheckpoint(eager=True)
    depth = queues.select(
        F.max(F.size(F.split("path", r"\."))).alias("d")
    ).collect()[0]["d"]
    qlvl = queues.withColumn("_lvl", F.size(F.split("path", r"\.")))

    roots = (
        qlvl.where(F.col("parent").isNull())
        .join(clusters, ["cluster_id", "label"])
        .select(
            "cluster_id", "label", "path",
            F.col("mem").alias("eff_min_mem"),
            F.col("vcores").alias("eff_min_vcores"),
            F.col("mem").alias("eff_max_mem"),
            F.col("vcores").alias("eff_max_vcores"),
            F.lit(1.0).alias("capacity"),
            F.lit(1.0).alias("max_capacity"),
            F.lit(1.0).alias("abs_capacity"),
            F.lit(1.0).alias("abs_max_capacity"),
        )
    )
    levels = [roots]
    for lvl in range(2, depth + 1):
        parent_state = levels[-1].select(
            F.col("cluster_id"), F.col("label"),
            F.col("path").alias("parent"),
            F.col("eff_min_mem").alias("_p_min_mem"),
            F.col("eff_min_vcores").alias("_p_min_vc"),
            F.col("eff_max_mem").alias("_p_max_mem"),
            F.col("eff_max_vcores").alias("_p_max_vc"),
            F.col("abs_capacity").alias("_p_abs"),
            F.col("abs_max_capacity").alias("_p_absmax"),
        )
        parent_conf = queues.select(
            "cluster_id", "label", F.col("path").alias("parent"),
            F.col("max_mem").alias("_p_cmax_mem"),
            F.col("max_vcores").alias("_p_cmax_vc"),
        )
        kids = (
            qlvl.where(F.col("_lvl") == lvl)
            .join(parent_state, ["cluster_id", "label", "parent"])
            .join(parent_conf, ["cluster_id", "label", "parent"])
            .join(clusters, ["cluster_id", "label"])
        )
        sums = kids.groupBy("cluster_id", "label", "parent").agg(
            F.sum("min_mem").alias("_sum_mem"),
            F.sum("min_vcores").alias("_sum_vc"),
        )
        kids = kids.join(sums, ["cluster_id", "label", "parent"])
        # DefaultResourceCalculator: scarcity compares by memory.
        scarce = F.col("_p_min_mem") < F.col("_sum_mem")
        rmem = F.when(
            scarce & (F.col("_sum_mem") != 0),
            F.col("_p_min_mem").cast("float")
            / F.col("_sum_mem").cast("float"),
        )
        rvc = F.when(
            scarce & (F.col("_sum_vc") != 0),
            F.col("_p_min_vc").cast("float")
            / F.col("_sum_vc").cast("float"),
        )
        eff_min_mem = (
            F.col("min_mem")
            * F.coalesce(rmem, F.lit(1.0).cast("float"))
        ).cast("long")
        eff_min_vc = (
            F.col("min_vcores")
            * F.coalesce(rvc, F.lit(1.0).cast("float"))
        ).cast("long")
        # parent max: its configured max, else its effective max
        pmax_mem = F.coalesce("_p_cmax_mem", "_p_max_mem")
        pmax_vc = F.coalesce("_p_cmax_vc", "_p_max_vc")
        cand_mem = F.coalesce("max_mem", pmax_mem)
        cand_vc = F.coalesce("max_vcores", pmax_vc)
        # Resources.min: whole-resource pick, memory-ordered, lhs-biased
        take_cand = cand_mem <= pmax_mem
        eff_max_mem = F.when(take_cand, cand_mem).otherwise(pmax_mem)
        eff_max_vc = F.when(take_cand, cand_vc).otherwise(pmax_vc)

        is_abs = F.col("mode") == "absolute"
        o_min_mem = F.when(is_abs, eff_min_mem).otherwise(
            (F.col("mem") * F.col("pct_abs_capacity").cast("float"))
            .cast("long")
        )
        o_min_vc = F.when(is_abs, eff_min_vc).otherwise(
            (F.col("vcores") * F.col("pct_abs_capacity").cast("float"))
            .cast("long")
        )
        o_max_mem = F.when(is_abs, eff_max_mem).otherwise(
            (F.col("mem") * F.col("pct_abs_max_capacity").cast("float"))
            .cast("long")
        )
        o_max_vc = F.when(is_abs, eff_max_vc).otherwise(
            (F.col("vcores")
             * F.col("pct_abs_max_capacity").cast("float"))
            .cast("long")
        )
        cap = F.when(
            is_abs,
            o_min_mem.cast("double") / F.col("_p_min_mem"),
        ).otherwise(F.col("pct_abs_capacity") / F.col("_p_abs"))
        # :1110-1114 divides by the parent's EFFECTIVE max resource
        maxcap = F.when(
            is_abs,
            o_max_mem.cast("double") / F.col("_p_max_mem"),
        ).otherwise(F.col("pct_abs_max_capacity") / F.col("_p_absmax"))
        # checkpoint each level's state: level L's lineage otherwise
        # re-evaluates level L-1's whole subtree (once as the next
        # level's parent_state, once again in the final union) — the
        # same per-iteration lineage cut the dedup CC loop uses.
        levels.append(
            kids.select(
                "cluster_id", "label", "path",
                o_min_mem.alias("eff_min_mem"),
                o_min_vc.alias("eff_min_vcores"),
                o_max_mem.alias("eff_max_mem"),
                o_max_vc.alias("eff_max_vcores"),
                cap.alias("capacity"),
                maxcap.alias("max_capacity"),
                (cap * F.col("_p_abs")).alias("abs_capacity"),
                (maxcap * F.col("_p_absmax")).alias("abs_max_capacity"),
            ).localCheckpoint(eager=True)
        )
    state = levels[0]
    for lv in levels[1:]:
        state = state.unionByName(lv)
    out = state.join(
        queues.select(
            "cluster_id", "label", "path", "is_leaf", "max_apps_conf",
            "user_limit", "user_limit_factor",
        ),
        ["cluster_id", "label", "path"],
    )
    max_apps = F.when(F.col("max_apps_conf") >= 0, F.col("max_apps_conf")) \
        .otherwise(
            (
                F.lit(
                    global_max_apps_per_queue
                    if global_max_apps_per_queue > 0
                    else max_system_apps
                )
                * F.col("abs_capacity")
            ).cast("int")
        )
    per_user = F.least(
        max_apps,
        (
            max_apps
            * (F.col("user_limit") / 100.0)
            * F.col("user_limit_factor")
        ).cast("int"),
    )
    return out.select(
        "cluster_id", "label", "path",
        "eff_min_mem", "eff_min_vcores", "eff_max_mem",
        "eff_max_vcores",
        F.round("capacity", 6).alias("capacity"),
        F.round("max_capacity", 6).alias("max_capacity"),
        F.round("abs_capacity", 6).alias("abs_capacity"),
        F.round("abs_max_capacity", 6).alias("abs_max_capacity"),
        F.when(F.col("is_leaf"), max_apps).cast("int").alias("max_apps"),
        F.when(F.col("is_leaf"), per_user).cast("int").alias(
            "max_apps_per_user"
        ),
    )
