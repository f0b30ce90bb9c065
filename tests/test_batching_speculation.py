"""Length-bucket shaping and speculative-execution decision pins."""

from __future__ import annotations

import pytest

from hadoop_source_spark.llmops import packing as pk
from hadoop_source_spark.operators import speculate as sp


def test_length_buckets_power_of_two_with_floor(spark):
    docs = spark.createDataFrame(
        [(0, 1), (1, 16), (2, 17), (3, 100), (4, 128), (5, 129), (6, 1000)],
        "doc_id long, n_chars int",
    )
    out = {r.bucket_width: r for r in
           pk.length_bucket_report(docs, "n_chars").collect()}
    # 1 and 16 → 16; 17 → 32; 100 and 128 → 128; 129 → 256; 1000 → 1024
    assert sorted(out) == [16, 32, 128, 256, 1024]
    assert out[16].n_docs == 2 and out[16].total_len == 17
    assert out[128].n_docs == 2 and out[128].pad_waste == 256 - 228
    assert out[1024].utilization == pytest.approx(1000 / 1024, abs=1e-6)
    # conservation: padded = total + waste in every bucket
    for r in out.values():
        assert r.padded_len == r.total_len + r.pad_waste
        assert r.padded_len == r.n_docs * r.bucket_width


def _tasks(spark, rows):
    return spark.createDataFrame(
        rows,
        "job string, task_id long, start_s long, progress double, "
        "state string, runtime_s double, has_speculative boolean",
    )


def test_speculation_decision_matrix(spark):
    now = spark.createDataFrame([(10_000,)], "now_s long")
    rows = [
        # completed baseline for job j: mean runtime 1000s
        ("j", 1, 0, 1.0, "SUCCEEDED", 800.0, False),
        ("j", 2, 0, 1.0, "SUCCEEDED", 1200.0, False),
        # straggler: started t=0, 20% done → est_end 50_000 > 11_000
        ("j", 3, 0, 0.20, "RUNNING", None, False),
        # healthy: started 9_900, 50% done → est_end 10_100 < 11_000
        ("j", 4, 9_900, 0.50, "RUNNING", None, False),
        # straggler already speculating → guard wins
        ("j", 5, 0, 0.20, "RUNNING", None, True),
        # nearly done straggler → guard wins
        ("j", 6, 0, 0.96, "RUNNING", None, False),
        # too young to extrapolate
        ("j", 7, 9_999, 0.01, "RUNNING", None, False),
        # job with no completed tasks → no baseline
        ("k", 8, 0, 0.20, "RUNNING", None, False),
    ]
    out = {r.task_id: r for r in
           sp.speculation_plan(_tasks(spark, rows), now).collect()}
    assert set(out) == {3, 4, 5, 6, 7, 8}  # completed tasks not emitted
    assert out[3].reason == "SPECULATE" and out[3].speculate
    assert out[3].est_end_s == 50_000
    assert out[3].replacement_end_s == 11_000
    assert out[4].reason == "ON_TRACK" and not out[4].speculate
    assert out[5].reason == "ALREADY_SPECULATING"
    assert out[6].reason == "NEARLY_DONE"
    assert out[7].reason == "TOO_YOUNG"
    assert out[8].reason == "NO_BASELINE"
    assert out[8].replacement_end_s is None


def test_range_partition_plan_ties_and_uniform(spark):
    from hadoop_source_spark import layout

    # uniform keys → every partition ~n/N rows, skew ~1
    uni = spark.range(800).selectExpr("cast(id as double) as k")
    out = {r.partition_id: r for r in
           layout.range_partition_plan(uni, "k", 4, exact=True).collect()}
    assert sorted(out) == [0, 1, 2, 3]
    assert all(abs(r.skew - 1.0) < 0.02 for r in out.values())
    assert out[0].lo is None and out[3].hi is None
    # boundaries increase
    bs = [out[i].hi for i in range(3)]
    assert bs == sorted(bs)

    # heavy ties: half the rows share one key → that bucket swallows
    # them (ties can't split across a boundary) and skew flags it
    sk = spark.range(800).selectExpr(
        "case when id % 2 = 0 then 42.0 else cast(id as double) end as k"
    )
    out2 = layout.range_partition_plan(sk, "k", 4, exact=True).collect()
    assert max(r.skew for r in out2) > 1.5

    # approx mode returns the same shape (sketch path)
    out3 = layout.range_partition_plan(uni, "k", 4, exact=False).collect()
    assert len(out3) == 4 and sum(r.est_rows for r in out3) == 800
