"""DistCp-style incremental sync planning (reference semantics:
hadoop-tools/hadoop-distcp — SimpleCopyListing builds the source
listing, CopyMapper skips files whose size+checksum already match at
the target under -update, and -delete removes target files absent from
the source; DistCpSync composes a snapshot diff into the copy plan).

Spark-first shape: both trees are DataFrames keyed by path; the plan is
ONE full-outer equi-join on path followed by a codegen CASE — no
listing collect, no driver loop. At 100 TB the listings are themselves
big tables (the reference streams them through a sequence file for the
same reason); a path-hash-partitioned join is exactly how that scales,
and AQE broadcasts whichever side is a small incremental batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sync_plan(
    src: DataFrame,
    dst: DataFrame,
    path_col: str = "path",
    size_col: str = "bytes",
    update: bool = True,
    delete: bool = True,
) -> DataFrame:
    """Classify every path into the DistCp action the sync would take:

      COPY    — exists only at source (new file)
      UPDATE  — exists on both sides but sizes differ (-update re-copies)
      SKIP    — exists on both sides, same size (-update skips)
      DELETE  — exists only at target (-delete removes it)

    Without -update, every source file is COPY (blind overwrite);
    without -delete, target-only files are left as SKIP.
    Returns (path, op, src_bytes, dst_bytes).
    """
    s = src.select(
        F.col(path_col).alias("path"), F.col(size_col).alias("src_bytes")
    )
    d = dst.select(
        F.col(path_col).alias("path"), F.col(size_col).alias("dst_bytes")
    )
    j = s.join(d, "path", "full_outer")
    src_only = F.col("src_bytes").isNotNull() & F.col("dst_bytes").isNull()
    dst_only = F.col("src_bytes").isNull() & F.col("dst_bytes").isNotNull()
    same = F.col("src_bytes") == F.col("dst_bytes")
    op = (
        F.when(src_only, F.lit("COPY"))
        .when(dst_only, F.lit("DELETE") if delete else F.lit("SKIP"))
        .when(same if update else F.lit(False), F.lit("SKIP"))
        .otherwise(F.lit("UPDATE" if update else "COPY"))
    )
    return j.select("path", op.alias("op"), "src_bytes", "dst_bytes")


def sync_plan_from_diff(diff: DataFrame, change_col: str = "change") -> DataFrame:
    """Incremental DistCp from a snapshot diff — `distcp -diff s1 s2`
    (reference hadoop-tools/hadoop-distcp DistCpSync.java): instead of
    -update's full source+target namespace scan-and-compare
    (:func:`sync_plan`), the copy plan is derived from the snapshot
    diff report alone, so the work is proportional to the CHANGE SET:

      '+' -> COPY    (new file: copy data)
      'M' -> UPDATE  (content changed: re-copy)
      '-' -> DELETE  (remove on target)
      'R' -> RENAME  (apply the rename on the TARGET without moving any
                      data across — DistCpSync's entire reason to exist)

    At 100 TB namespaces with 0.1% churn this is a 1000x smaller job
    than the full sync scan; the diff itself comes from
    setops.snapshot_diff (one full-outer join of the two versions, or —
    against a real snapshotting store — straight from its report)."""
    c = F.col(change_col)
    return diff.withColumn(
        "op",
        F.when(c == "+", "COPY")
        .when(c == "-", "DELETE")
        .when(c == "M", "UPDATE")
        .when(c == "R", "RENAME"),
    )


def checksum_sync_plan(
    src: DataFrame,
    dst: DataFrame,
    path_col: str = "path",
    text_col: str = "text",
    bytes_per_chunk: int = 64,
    chunks_per_block: int = 4,
) -> DataFrame:
    """Checksum-gated sync (-update with checksum comparison): same-size
    files can still differ, so the reference's CopyMapper skips a file
    only when the DISTRIBUTED FILE CHECKSUMS match (the hierarchical
    MD5-of-block-MD5s of hdfs-client FileChecksumHelper.java:280 —
    comparable across clusters precisely because it composes per-block
    digests). Built on functions/filechecksum.block_digests, which also
    yields the block-level delta: how many blocks actually changed — the
    rsync-style re-copy lower bound.

      COPY          — source only
      DELETE        — target only
      SKIP          — checksums equal
      UPDATE        — checksums differ (n_blocks_changed > 0)

    Both digest trees evaluate inside the projection feeding ONE
    full-outer path join — no second pass over the data."""
    from hadoop_source_spark.functions import filechecksum as fc

    def digests(df, prefix):
        return df.select(
            F.col(path_col).alias("path"),
            fc.block_digests(
                F.col(text_col), bytes_per_chunk, chunks_per_block
            ).alias(prefix + "_blocks"),
        )

    s, d = digests(src, "src"), digests(dst, "dst")
    j = s.join(d, "path", "full_outer")
    sb, db = F.col("src_blocks"), F.col("dst_blocks")
    mx = F.greatest(
        F.coalesce(F.size(sb), F.lit(0)), F.coalesce(F.size(db), F.lit(0))
    )
    changed = F.size(
        F.filter(
            F.sequence(F.lit(0), mx - 1),
            lambda i: (i >= F.size(sb))
            | (i >= F.size(db))
            | (F.get(sb, i.cast("int")) != F.get(db, i.cast("int"))),
        )
    )
    changed = F.when(mx > 0, changed).otherwise(F.lit(0))
    src_only = sb.isNotNull() & db.isNull()
    dst_only = sb.isNull() & db.isNotNull()
    op = (
        F.when(src_only, F.lit("COPY"))
        .when(dst_only, F.lit("DELETE"))
        .when(changed == 0, F.lit("SKIP"))
        .otherwise(F.lit("UPDATE"))
    )
    return j.select(
        "path",
        op.alias("op"),
        F.coalesce(F.size(sb), F.lit(0)).alias("src_blocks_n"),
        F.coalesce(F.size(db), F.lit(0)).alias("dst_blocks_n"),
        changed.alias("n_blocks_changed"),
    )
