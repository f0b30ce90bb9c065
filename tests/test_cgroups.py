"""CGroups usage calculator pins (CGroupsResourceCalculator.java:
152-192,246-262; CpuTimeTracker.java:66-106;
CombinedResourceCalculator.java:61-110)."""

from __future__ import annotations

from hadoop_source_spark.operators import cgroups as cg
from hadoop_source_spark.operators import contmon

SCHEMA = (
    "container_id string, sample_ts long, cpuacct_stat string,"
    " mem_usage long, memsw_usage long, procfs_vmem long"
)


def run(spark, rows):
    out = cg.usage_report(spark.createDataFrame(rows, SCHEMA)).collect()
    return sorted(out, key=lambda r: (r["container_id"], r["sample_ts"]))


def test_jiffy_parse_and_memory_fields(spark):
    (r,) = run(spark, [
        ("c1", 1000, "user 120\nsystem 30\nextra 99", 512, 600, 2048),
    ])
    # only the user/system lines count
    assert r["total_jiffies"] == 150
    assert r["cumulative_cpu_ms"] == 1500
    assert r["rss_bytes"] == 512
    assert r["vmem_cgroup"] == 600       # memsw = physical + swap
    assert r["vmem_combined"] == 2048    # procfs supplies real vmem
    assert r["cpu_usage_pct"] == -1.0    # one sample: unavailable


def test_missing_memsw_reports_zero(spark):
    (r,) = run(spark, [("c1", 1000, "user 1\nsystem 1", 10, None, 20)])
    assert r["vmem_cgroup"] == 0


def test_cpu_percent_over_samples(spark):
    rows = [
        ("c1", 1000, "user 100\nsystem 0", 1, 1, 1),
        # 2000ms later, 150 jiffies total -> +500ms cpu / 2000ms = 25%
        ("c1", 3000, "user 120\nsystem 30", 1, 1, 1),
        # jiffies went BACKWARD (subsystem restart): cumulative holds
        ("c1", 6000, "user 50\nsystem 0", 1, 1, 1),
    ]
    out = run(spark, rows)
    assert [r["cpu_usage_pct"] for r in out] == [-1.0, 25.0, 0.0]
    assert [r["cumulative_cpu_ms"] for r in out] == [1000, 1500, 1500]


def test_sub_interval_sample_holds_previous_percent(spark):
    rows = [
        ("c1", 1000, "user 100\nsystem 0", 1, 1, 1),
        ("c1", 3000, "user 150\nsystem 0", 1, 1, 1),   # 25%
        # only 50ms later (< 10 jiffies * 10ms): percent held, anchor
        # does NOT advance
        ("c1", 3050, "user 200\nsystem 0", 1, 1, 1),
        # next computation spans from the 3000ms anchor
        ("c1", 4000, "user 250\nsystem 0", 1, 1, 1),
    ]
    out = run(spark, rows)
    assert [round(r["cpu_usage_pct"], 4) for r in out] == [
        -1.0, 25.0, 25.0, 100.0]


def test_monitor_tick_composition(spark):
    usage = cg.usage_report(spark.createDataFrame([
        ("c1", 1000, "user 1\nsystem 0", 100, 150, 5000),
        ("c1", 3000, "user 2\nsystem 0", 900, 950, 9000),
    ], SCHEMA))
    limits = spark.createDataFrame(
        [("c1", 8000, 800, False, False)],
        "container_id string, vmem_limit long, pmem_limit long,"
        " strict_enforcement boolean, elastic_memory boolean",
    )
    ticks = cg.monitor_ticks(usage, limits)
    (t,) = ticks.collect()
    # the LATEST sample feeds the tick; aged == current under cgroups
    assert (t["vmem_usage"], t["vmem_aged"]) == (9000, 9000)
    assert (t["pmem_usage"], t["rss_aged"]) == (900, 900)
    (verdict,) = contmon.check_memory_limits(
        ticks.drop("cpu_usage_pct")).collect()
    # vmem 9000 > limit 8000 (aged over) -> vmem kill fires first
    assert verdict["exit_status"] == contmon.KILLED_EXCEEDED_VMEM
