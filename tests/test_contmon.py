"""NM container memory-enforcement pins (ContainersMonitorImpl.java
checkLimit:724-789, isProcessTreeOverLimit:458-489)."""

from __future__ import annotations

from hadoop_source_spark.operators import contmon

SCHEMA = (
    "container_id long, vmem_usage long, vmem_aged long, pmem_usage long,"
    " rss_aged long, vmem_limit long, pmem_limit long,"
    " strict_enforcement boolean, elastic_memory boolean"
)


def _run(spark, rows, **flags):
    out = contmon.check_memory_limits(
        spark.createDataFrame(rows, SCHEMA), **flags
    ).collect()
    return {r["container_id"]: r for r in out}


def test_two_x_and_aged_rules(spark):
    got = _run(
        spark,
        [
            # fresh spike below 2x, nothing aged: one-iteration grace
            (1, 0, 0, 1500, 0, 4096, 1024, False, False),
            # fresh spike ABOVE 2x: immediate kill
            (2, 0, 0, 2049, 0, 4096, 1024, False, False),
            # aged processes over the limit: kill even below 2x
            (3, 0, 0, 1500, 1100, 4096, 1024, False, False),
            # comfortably within
            (4, 0, 0, 512, 100, 4096, 1024, False, False),
        ],
    )
    assert got[1]["action"] == "OVER_LIMIT_GRACE"
    assert got[1]["exit_status"] is None
    assert got[2]["action"] == "KILL_CONTAINER"
    assert got[2]["exit_status"] == -104
    assert got[2]["delta"] == 2049 - 1024
    assert got[3]["action"] == "KILL_CONTAINER"
    assert got[4]["action"] == "WITHIN_LIMITS"


def test_vmem_checked_before_pmem(spark):
    got = _run(
        spark,
        [(1, 9000, 9000, 3000, 3000, 4096, 1024, False, False)],
    )[1]
    assert got["over_dim"] == "virtual"
    assert got["exit_status"] == -103
    assert got["delta"] == 9000 - 4096


def test_check_flags_gate_dimensions(spark):
    rows = [(1, 9000, 9000, 3000, 3000, 4096, 1024, False, False)]
    got = _run(spark, rows, vmem_check=False)[1]
    assert got["over_dim"] == "physical"
    assert got["exit_status"] == -104
    got = _run(spark, rows, vmem_check=False, pmem_check=False)[1]
    assert got["action"] == "WITHIN_LIMITS"


def test_strict_without_elastic_skips_polling(spark):
    got = _run(
        spark,
        [
            (1, 9000, 9000, 3000, 3000, 4096, 1024, True, False),
            (2, 9000, 9000, 3000, 3000, 4096, 1024, True, True),
        ],
    )
    # strict alone: kernel OOM owns it; strict + elastic falls back
    assert got[1]["action"] == "SKIP_CGROUP_OOM"
    assert got[1]["exit_status"] is None
    assert got[2]["action"] == "KILL_CONTAINER"
