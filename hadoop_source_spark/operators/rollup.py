"""Incremental materialized-rollup maintenance: keep an aggregate table
(e.g. hourly per-type metrics) current under append batches WITHOUT
recomputing history (reference analog: the namenode applies edit-log
deltas to the checkpointed fsimage rather than replaying the world —
FSImage.loadEdits; same idea, aggregate-shaped).

Scale shape: additive aggregates (count/sum, and anything expressible
over them, e.g. avg = sum/count) form a monoid, so maintenance is
  agg(delta) ∪ old-rollup → groupBy keys → sum
— cost proportional to the DELTA plus the touched groups, never the
base table. On disk the rollup is partitioned by a coarse time column
and only TOUCHED partitions rewrite (the same blast-radius bound as
operators/upsert.partitioned_upsert)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_rollup(df: DataFrame, ts_col: str, series_col: str) -> DataFrame:
    """The maintained aggregate: per (series, hour) count + value sum
    (avg is derived at read time as sum/count, keeping state additive)."""
    return (
        df.select(
            F.col(series_col).alias("series"),
            F.date_trunc("hour", F.col(ts_col)).alias("hr"),
            "value",
        )
        .groupBy("series", "hr")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v"))
        .withColumn("day", F.date_format("hr", "yyyy-MM-dd"))
    )


def merge_rollups(old: DataFrame, delta: DataFrame) -> DataFrame:
    """Monoid merge of two rollup states."""
    return (
        old.unionByName(delta)
        .groupBy("series", "hr", "day")
        .agg(F.sum("n").alias("n"), F.sum("sum_v").alias("sum_v"))
        .select("series", "hr", "n", "sum_v", "day")
    )


def maintain(
    spark: SparkSession,
    rollup_dir: str,
    batch: DataFrame,
    ts_col: str = "ts",
    series_col: str = "event_type",
) -> list[str]:
    """Fold one append batch into the on-disk rollup, rewriting only the
    day partitions the batch touches. Returns the rewritten partitions."""
    delta = hourly_rollup(batch, ts_col, series_col)
    touched = [r[0] for r in delta.select("day").distinct().collect()]
    if not touched:
        return []
    if os.path.isdir(rollup_dir) and any(
        e.startswith("day=") for e in os.listdir(rollup_dir)
    ):
        old = spark.read.parquet(rollup_dir).filter(F.col("day").isin(touched))
        merged = merge_rollups(old, delta)
    else:
        merged = delta
    # bounded by the batch's blast radius: only touched partitions' rows
    merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").partitionBy("day").option(
        "partitionOverwriteMode", "dynamic"
    ).parquet(rollup_dir)
    return sorted(touched)
