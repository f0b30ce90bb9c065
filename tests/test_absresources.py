"""Absolute-resource pins (ParentQueue.updateEffectiveResources:
948-1039; getEffectiveMinRatioPerResource:1065-1086 zero-sum
passthrough; Resources.min whole-resource pick;
deriveCapacityFromAbsoluteConfigurations:1088-1121 effective-max
denominator)."""

from __future__ import annotations

from hadoop_source_spark.operators import absresources

Q_SCHEMA = (
    "cluster_id long, label string, path string, parent string,"
    " mode string, min_mem long, min_vcores long, max_mem long,"
    " max_vcores long, pct_abs_capacity double,"
    " pct_abs_max_capacity double, is_leaf boolean, max_apps_conf int,"
    " user_limit double, user_limit_factor double"
)
C_SCHEMA = "cluster_id long, label string, mem long, vcores long"


def _run(spark, queues, clusters):
    out = absresources.effective_resources(
        spark.createDataFrame(queues, Q_SCHEMA),
        spark.createDataFrame(clusters, C_SCHEMA),
        global_max_apps_per_queue=0, max_system_apps=10_000,
    ).collect()
    return {r["path"]: r for r in out}


def q(path, parent, min_mem=0, min_vc=0, max_mem=None, max_vc=None,
      leaf=False, mode="absolute"):
    return (0, "", path, parent, mode, min_mem, min_vc, max_mem,
            max_vc, None, None, leaf, -1, 50.0, 1.0)


def test_zero_sum_dimension_passes_through(spark):
    # Children configure memory but ZERO vcores: the vcores dimension
    # gets no ratio entry (:1082 dValue != 0 guard), so even under
    # memory scarcity the configured vcores value (0) passes through
    # unscaled while memory halves.
    got = _run(spark, [
        q("root", None),
        q("root.a", "root", min_mem=800, min_vc=0, leaf=True),
        q("root.b", "root", min_mem=1200, min_vc=0, leaf=True),
    ], [(0, "", 1000, 100)])
    assert got["root.a"]["eff_min_mem"] == 400   # 800 * 1000/2000
    assert got["root.b"]["eff_min_mem"] == 600
    assert got["root.a"]["eff_min_vcores"] == 0


def test_whole_resource_max_pick_and_effective_denominator(spark):
    # Parent's configured max (900 mem, 90 vc) exceeds the root
    # resource; its own effective max is min-by-memory(900, 1000
    # [root eff]) = 900. The child has no configured max -> candidate
    # is the parent's CONFIGURED max; the whole resource (900, 90) is
    # taken — vcores FOLLOW the memory pick, no componentwise mixing.
    # max_capacity divides by the parent's EFFECTIVE max (:1110).
    got = _run(spark, [
        q("root", None),
        q("root.p", "root", min_mem=500, min_vc=50, max_mem=900,
          max_vc=90),
        q("root.p.c", "root.p", min_mem=250, min_vc=25, leaf=True),
    ], [(0, "", 1000, 100)])
    assert got["root.p"]["eff_max_mem"] == 900
    assert got["root.p"]["eff_max_vcores"] == 90
    assert got["root.p.c"]["eff_max_mem"] == 900
    assert got["root.p.c"]["eff_max_vcores"] == 90
    assert got["root.p.c"]["max_capacity"] == 1.0
    assert got["root.p.c"]["capacity"] == 0.5     # 250/500
    assert got["root.p.c"]["abs_capacity"] == 0.25
    assert got["root.p.c"]["max_apps"] == 2500
    assert got["root.p.c"]["max_apps_per_user"] == 1250


def test_child_max_capped_by_parent_max(spark):
    got = _run(spark, [
        q("root", None),
        q("root.p", "root", min_mem=400, min_vc=40, max_mem=500,
          max_vc=50),
        # child asks for more max than the parent allows
        q("root.p.c", "root.p", min_mem=200, min_vc=20, max_mem=800,
          max_vc=80, leaf=True),
    ], [(0, "", 1000, 100)])
    assert got["root.p.c"]["eff_max_mem"] == 500
    assert got["root.p.c"]["eff_max_vcores"] == 50
