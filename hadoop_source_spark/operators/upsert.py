"""Keyed upsert (merge) over immutable columnar storage.

Reference analog: HDFS mutates a namespace by accumulating an edit log
and periodically CHECKPOINTING it into the fsimage — replaying edits
over the base image, newest txid wins (hdfs/server/namenode/
FSImage.java:673 loadEdits, Checkpointer.java:206 doCheckpoint). The
Spark-first translation for a keyed table on parquet: base ∪ updates →
keep the highest-version row per key, rewriting only the partitions the
updates touch.

Scale shape: the merge itself is one hash shuffle on the key (window
keep-latest); ``partitioned_upsert`` prunes the rewrite to affected
partitions — the update set names the partition values it touches
(collected; partition cardinality is namespace-metadata-small by
design), the base read filters to exactly those (partition pruning, no
full-table scan), and dynamic partition overwrite replaces only those
directories. A 100 TB table with daily partitions takes an upsert at
the cost of the touched days, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_orderable(dt: T.DataType) -> bool:
    """Mirror Catalyst's RowOrdering.isOrderable: maps never sort; arrays
    and structs are orderable iff their element/field types are."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _is_orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_is_orderable(f.dataType) for f in dt.fields)
    return True


def latest_wins(
    df: DataFrame, key_cols: list[str], version_col: str
) -> DataFrame:
    """One row per key: the highest version. Duplicate (key, version)
    rows are resolved by a deterministic tiebreak over every remaining
    ORDERABLE column, so a replayed upsert always keeps the SAME surviving
    row — the idempotence the fsimage/edit-log analog requires (txids are
    unique in the reference; here we tolerate collisions instead).
    Non-orderable columns (map<k,v>) are skipped: Spark cannot ORDER BY
    them, and a key whose orderable columns tie is identical for the
    caller's purposes anyway."""
    orderable = {
        f.name
        for f in df.schema.fields
        if _is_orderable(f.dataType)
    }
    tiebreak = [
        F.col(c).desc_nulls_last()
        for c in df.columns
        if c not in key_cols and c != version_col and c in orderable
    ]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), *tiebreak
    )
    return (
        df.select("*", F.row_number().over(w).alias("__rn"))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> DataFrame:
    """Merge updates into base, newest version per key winning. Inserts
    (new keys) and updates (higher version) in one pass; deletes are
    modeled as tombstone rows the caller filters afterwards (the edit-log
    convention)."""
    return latest_wins(
        base.unionByName(updates), key_cols, version_col
    )


def partitioned_upsert(
    spark: SparkSession,
    base_dir: str,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
    partition_col: str,
) -> list:
    """Apply `updates` to the parquet table at `base_dir` partitioned by
    `partition_col`, rewriting ONLY the touched partitions. Updates must
    carry the partition column (a key row lives in one partition).
    Returns the list of partition values rewritten."""
    touched = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    if not touched:
        return []
    base = spark.read.parquet(base_dir).filter(
        F.col(partition_col).isin(touched)
    )
    # Materialize before writing: Spark (rightly) refuses a write that
    # overwrites a path its own plan is reading. The checkpoint holds
    # only the TOUCHED partitions' rows — bounded by the update's blast
    # radius, not the table.
    merged = upsert(base, updates, key_cols, version_col).localCheckpoint(
        eager=True
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(base_dir)
    )
    return touched


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """MERGE-style CDC apply (the Delta/Iceberg MERGE INTO semantics,
    public; in reference terms this is one edit-log replay onto an
    fsimage — OP_ADD/OP_CLOSE upserts and OP_DELETE tombstones applied
    in a single pass, hdfs/server/namenode/FSEditLogLoader.java):

      op = 'D'        → key removed from the result
      op = 'I' / 'U'  → change row replaces/creates the key's row

    One pass, two hash-joins on the key (anti to drop D/U-shadowed base
    rows, union of surviving change rows) — at scale the change feed is
    usually batch-sized, so AQE broadcasts it; the base table is never
    rewritten beyond the keys it must lose. Change rows must be
    key-unique (one op per key per apply, the CDC batch contract)."""
    keyed = changes.select(*key_cols, op_col)
    survivors = base.join(keyed, key_cols, "left_anti")
    applied = changes.filter(F.col(op_col) != "D").drop(op_col)
    return survivors.unionByName(applied)
