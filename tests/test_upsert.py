"""Keyed upsert: latest-version-wins merge and partition-pruned rewrite
(the fsimage + edit-log checkpoint analog)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from hadoop_source_spark.operators import upsert as up

SCHEMA = "k long, day string, v string, txid long"

BASE = [
    (1, "d1", "a", 10),
    (2, "d1", "b", 11),
    (3, "d2", "c", 12),
    (4, "d3", "d", 13),
]
UPDATES = [
    (2, "d1", "b2", 20),   # update existing key
    (5, "d2", "e", 21),    # insert new key
    (3, "d2", "c0", 5),    # STALE update (lower txid) — must lose
]


def test_upsert_latest_wins(spark):
    base = spark.createDataFrame(BASE, SCHEMA)
    updates = spark.createDataFrame(UPDATES, SCHEMA)
    got = {
        r.k: (r.v, r.txid)
        for r in up.upsert(base, updates, ["k"], "txid").collect()
    }
    assert got == {
        1: ("a", 10), 2: ("b2", 20), 3: ("c", 12), 4: ("d", 13),
        5: ("e", 21),
    }


def test_partitioned_upsert_rewrites_only_touched(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    base = spark.createDataFrame(BASE, SCHEMA)
    base.write.partitionBy("day").parquet(tbl)
    d3_files_before = sorted(os.listdir(os.path.join(tbl, "day=d3")))

    updates = spark.createDataFrame(UPDATES, SCHEMA)
    touched = up.partitioned_upsert(
        spark, tbl, updates, ["k"], "txid", "day"
    )
    assert sorted(touched) == ["d1", "d2"]

    got = {r.k: (r.v, r.txid) for r in spark.read.parquet(tbl).collect()}
    assert got == {
        1: ("a", 10), 2: ("b2", 20), 3: ("c", 12), 4: ("d", 13),
        5: ("e", 21),
    }
    # the untouched partition's files were not rewritten
    assert sorted(os.listdir(os.path.join(tbl, "day=d3"))) == d3_files_before


def test_partitioned_upsert_empty_updates_is_noop(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    spark.createDataFrame(BASE, SCHEMA).write.partitionBy("day").parquet(tbl)
    touched = up.partitioned_upsert(
        spark, tbl,
        spark.createDataFrame([], SCHEMA), ["k"], "txid", "day",
    )
    assert touched == []
    assert spark.read.parquet(tbl).count() == len(BASE)


def test_tombstone_delete(spark):
    """Deletes as tombstones: newest version carries a deleted flag the
    reader filters — the edit-log convention."""
    base = spark.createDataFrame(BASE, SCHEMA).withColumn(
        "deleted", F.lit(False)
    )
    tomb = spark.createDataFrame([(4, "d3", "d", 30)], SCHEMA).withColumn(
        "deleted", F.lit(True)
    )
    merged = up.upsert(base, tomb, ["k"], "txid").filter(~F.col("deleted"))
    assert {r.k for r in merged.collect()} == {1, 2, 3}


def test_upsert_with_map_column(spark):
    """map<k,v> columns are not orderable — the deterministic tiebreak
    must skip them instead of raising AnalysisException (ADVICE r3)."""
    rows = [
        (1, 1, "a", {"x": "1"}),
        (1, 2, "a2", {"x": "2"}),
        (2, 1, "b", {"y": "9"}),
    ]
    schema = "k long, txid long, v string, props map<string,string>"
    df = spark.createDataFrame(rows, schema)
    out = up.latest_wins(df, ["k"], "txid")
    got = {r.k: (r.txid, r.v) for r in out.collect()}
    assert got == {1: (2, "a2"), 2: (1, "b")}


def test_apply_changes_merge_semantics(spark):
    """CDC MERGE contract: D removes, U replaces, I inserts, untouched
    rows pass through bit-identical; change feed is key-unique."""
    from hadoop_source_spark.operators import upsert as ups

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    changes = spark.createDataFrame(
        [(2, "b2", 25.0, "U"), (3, "c", 30.0, "D"), (9, "z", 99.0, "I")],
        ["k", "s", "v", "op"],
    )
    got = {
        r.k: (r.s, r.v)
        for r in ups.apply_changes(base, changes, ["k"], "op").collect()
    }
    assert got == {1: ("a", 10.0), 2: ("b2", 25.0), 9: ("z", 99.0)}


def test_incremental_rollup_equals_full_recompute(spark, tmp_path):
    """Materialized-rollup maintenance: folding N append batches into the
    on-disk rollup (delta-agg + monoid merge, touched day partitions
    only) must equal the rollup recomputed from all events at once, and
    each fold must rewrite only the days its batch touches."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from hadoop_source_spark.operators import rollup as ru

    rdir = str(tmp_path / "rollup")
    batches = [
        [("a", datetime(2024, 1, 1, 3, 5), 1.0),
         ("a", datetime(2024, 1, 1, 3, 40), 2.0),
         ("b", datetime(2024, 1, 1, 9, 0), 5.0)],
        [("a", datetime(2024, 1, 1, 3, 50), 4.0),   # same hour as batch 0!
         ("b", datetime(2024, 1, 2, 10, 0), 7.0)],
        [("a", datetime(2024, 1, 3, 0, 1), 9.0)],
    ]
    schema = "event_type string, ts timestamp, value double"
    expected_touched = [["2024-01-01"], ["2024-01-01", "2024-01-02"], ["2024-01-03"]]
    for rows, exp in zip(batches, expected_touched):
        touched = ru.maintain(spark, rdir, spark.createDataFrame(rows, schema))
        assert touched == exp

    maintained = {
        (r.series, r.hr, r.n, r.sum_v)
        for r in spark.read.parquet(rdir).select("series", "hr", "n", "sum_v").collect()
    }
    full = ru.hourly_rollup(
        spark.createDataFrame([x for b in batches for x in b], schema),
        "ts", "event_type",
    )
    recomputed = {
        (r.series, r.hr, r.n, r.sum_v)
        for r in full.select("series", "hr", "n", "sum_v").collect()
    }
    assert maintained == recomputed
    # the merged hour accumulated across batches
    merged_hour = next(x for x in maintained if x[0] == "a" and x[1].hour == 3)
    assert merged_hour[2] == 3 and merged_hour[3] == 7.0
