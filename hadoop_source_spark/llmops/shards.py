"""Training-data shard writer — the last mile of a corpus pipeline:
deterministic, size-bounded shards plus a manifest (the WebDataset /
tfrecord-shards layout convention: fixed-row shards in a stable global
order, a manifest row per shard so loaders can plan epochs and resume
without listing files).

Scale shape: the global order comes from
operators.relational.with_global_positions (ONE range exchange + a
partition-count-sized offset map — no SinglePartition window at any
scale); the shard assignment is a projection; the write is one
partitionBy(shard_id) parquet job. The manifest is a shard-count-sized
aggregate of the same frame."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_source_spark.operators import relational


def shard_assignments(
    df: DataFrame,
    order: list,
    rows_per_shard: int,
    pos_col: str = "seq_pos",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Attach (pos_col, shard_col): contiguous global position in the
    given deterministic order, and shard = pos div rows_per_shard —
    every shard except the last holds exactly rows_per_shard rows.

    ``order`` must be a TOTAL order (include a unique id as the final
    key): ties would make shard membership depend on physical row
    order and break write determinism."""
    pos = relational.with_global_positions(df, order, pos_col)
    return pos.withColumn(
        shard_col,
        F.floor(F.col(pos_col) / rows_per_shard).cast("long"),
    )


def write_shards(
    df: DataFrame,
    out_dir: str,
    order: list,
    rows_per_shard: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Write size-bounded shards under ``out_dir`` (one parquet
    partition per shard) and return the manifest: (shard_id, n_rows,
    min_pos, max_pos, id_sum) — id_sum is an order-independent content
    checksum over the member ids, so a manifest mismatch pinpoints the
    damaged shard without reading data."""
    sharded = shard_assignments(df, order, rows_per_shard)
    sharded.write.mode("overwrite").partitionBy("shard_id").parquet(out_dir)
    return (
        sharded.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("seq_pos").alias("min_pos"),
            F.max("seq_pos").alias("max_pos"),
            F.sum(id_col).alias("id_sum"),
        )
    )
