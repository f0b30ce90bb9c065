"""CGroups usage accounting: the NodeManager's cgroupfs resource
calculators — cpuacct.stat jiffy parsing, the monotonic cumulative-CPU
tracker with its percent math, and memory readings — feeding the
container memory kill policy (operators/contmon.py) end-to-end.

Reference semantics:

- `hadoop-yarn-server-nodemanager/.../linux/resources/
  CGroupsResourceCalculator.java`: total process jiffies are the sum
  of the ``user N`` and ``system N`` lines of ``cpuacct.stat``
  (``readTotalProcessJiffies:246-262``); cumulative CPU time is
  jiffies x the jiffy length (``getCumulativeCpuTime:152-158``);
  physical memory is ``memory.usage_in_bytes`` and "virtual" memory
  is ``memory.memsw.usage_in_bytes`` — physical plus swap — when the
  kernel exposes it (``updateProcessTree:176-192``; the class comment
  :54-59 documents that cgroups cannot see true virtual memory).
  CGroups has no process ages: ``getRssMemorySize(olderThanAge > 1)``
  is UNAVAILABLE and age<=1 returns the current reading (:160-174),
  so the monitor's aged usage EQUALS current usage under cgroups.
- `hadoop-common/.../util/CpuTimeTracker.java`: cumulative CPU only
  moves forward (``updateElapsedJiffies:100-106`` keeps the max);
  the percent getter (:66-86) returns UNAVAILABLE (-1) until two
  samples sit more than ``10 x jiffyLength`` ms apart, then
  ``(cum - lastCum) * 100 / (sampleTime - lastSampleTime)`` — and
  HOLDS the previous percent (advancing nothing) for samples inside
  the minimum interval.
- `CombinedResourceCalculator.java:61-110`: cpu percent, cumulative
  CPU and RSS come from the cgroup calculator; VIRTUAL memory comes
  from procfs — the one number cgroups cannot produce.

Spark-first: the stat-file parsing and memory projections are JVM
higher-order functions; only the CpuTimeTracker scan — a stateful
per-container walk whose anchor samples depend on prior anchors — is
an Arrow-batched applyInPandas kernel, partition-parallel by
container with work proportional to that container's sample count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNAVAILABLE = -1
JIFFY_MS = 10

_OUT_SCHEMA = (
    "container_id string, sample_ts long, total_jiffies long,"
    " cumulative_cpu_ms long, cpu_usage_pct double, rss_bytes long,"
    " vmem_cgroup long, vmem_combined long"
)


def parse_jiffies(stat_col):
    """readTotalProcessJiffies:246-262 — sum of the ``user`` and
    ``system`` jiffy lines of a cpuacct.stat blob."""
    return F.aggregate(
        F.filter(
            F.split(stat_col, "\n"),
            lambda ln: ln.startswith("user ") | ln.startswith("system "),
        ),
        F.lit(0).cast("long"),
        lambda acc, ln: acc
        + F.split(ln, " ")[1].cast("long"),
    )


def usage_report(
    samples: DataFrame, *, jiffy_ms: int = JIFFY_MS
) -> DataFrame:
    """Per-sample usage as the combined calculator reports it.

    ``samples``: (container_id, sample_ts long ms, cpuacct_stat
    string, mem_usage long, memsw_usage long nullable — null when the
    kernel lacks swap accounting, procfs_vmem long).

    Returns (container_id, sample_ts, total_jiffies,
    cumulative_cpu_ms — monotonic, cpu_usage_pct — the CpuTimeTracker
    value at this sample (-1 until measurable), rss_bytes,
    vmem_cgroup — memsw or 0, vmem_combined — the procfs virtual
    size)."""
    min_interval = 10 * jiffy_ms

    parsed = samples.select(
        "container_id", "sample_ts",
        parse_jiffies(F.col("cpuacct_stat")).alias("total_jiffies"),
        F.col("mem_usage").alias("rss_bytes"),
        F.coalesce(F.col("memsw_usage"), F.lit(0)).alias("vmem_cgroup"),
        F.col("procfs_vmem").alias("vmem_combined"),
    )

    def tracker(pdf):
        import pandas as pd

        pdf = pdf.sort_values("sample_ts")
        cum = 0
        usage = float(UNAVAILABLE)
        last_ts = UNAVAILABLE
        last_cum = 0
        out_cum, out_pct = [], []
        for ts, jf in zip(
            pdf["sample_ts"].tolist(), pdf["total_jiffies"].tolist()
        ):
            # updateElapsedJiffies: monotonic cumulative
            cum = max(cum, jf * jiffy_ms)
            # getCpuTrackerUsagePercent
            if last_ts == UNAVAILABLE or last_ts > ts:
                last_ts, last_cum = ts, cum
            elif ts > last_ts + min_interval:
                usage = (cum - last_cum) * 100.0 / (ts - last_ts)
                last_ts, last_cum = ts, cum
            out_cum.append(cum)
            out_pct.append(usage)
        return pd.DataFrame(
            {
                "container_id": pdf["container_id"],
                "sample_ts": pdf["sample_ts"],
                "total_jiffies": pdf["total_jiffies"],
                "cumulative_cpu_ms": out_cum,
                "cpu_usage_pct": out_pct,
                "rss_bytes": pdf["rss_bytes"],
                "vmem_cgroup": pdf["vmem_cgroup"],
                "vmem_combined": pdf["vmem_combined"],
            }
        )

    return parsed.groupBy("container_id").applyInPandas(
        tracker, _OUT_SCHEMA
    )


def monitor_ticks(usage: DataFrame, limits: DataFrame) -> DataFrame:
    """Shape the LATEST usage sample per container into the
    ContainersMonitor tick consumed by
    operators/contmon.check_memory_limits — under cgroups the aged
    usage equals current usage (getRssMemorySize:160-174), and the
    combined calculator supplies procfs virtual memory
    (CombinedResourceCalculator:103-110).

    ``limits``: (container_id, vmem_limit long, pmem_limit long,
    strict_enforcement boolean, elastic_memory boolean)."""
    latest = (
        usage.groupBy("container_id")
        .agg(
            F.max_by(
                F.struct("vmem_combined", "rss_bytes", "cpu_usage_pct"),
                "sample_ts",
            ).alias("u")
        )
        .select(
            "container_id",
            F.col("u.vmem_combined").alias("vmem_usage"),
            F.col("u.vmem_combined").alias("vmem_aged"),
            F.col("u.rss_bytes").alias("pmem_usage"),
            F.col("u.rss_bytes").alias("rss_aged"),
            F.col("u.cpu_usage_pct").alias("cpu_usage_pct"),
        )
    )
    return latest.join(limits, "container_id")
