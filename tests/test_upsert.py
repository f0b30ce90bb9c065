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
