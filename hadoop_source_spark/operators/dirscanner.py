"""DataNode DirectoryScanner reconciliation: the on-disk vs in-memory
replica diff and the per-block repair action.

Reference semantics:
- `datanode/DirectoryScanner.java:457-552 (scan)` — per block pool, a
  sorted merge of the volume scan reports against the dataset's
  FINALIZED replica list. Disk-only records are "missing in memory"
  UNLESS the dataset is already deleting that block (skipped
  entirely); memory-only records are "missing on disk"; matched
  records diff further in this order: block file absent (meta-only
  orphan) first, then genstamp/length mismatch, then a volumeMap/
  on-disk location mismatch (duplicate replicas). Non-FINALIZED
  replicas are absent from the memory list, so their on-disk files
  surface as missing-in-memory at scan time.
- `datanode/DirectoryScanner.java:427-440 (reconcile)` — every diff
  is handed to the dataset's checkAndUpdate.
- `fsdataset/impl/FsDatasetImpl.java:2410-2608 (checkAndUpdate)` —
  the repair decision table: a found non-FINALIZED replica ends the
  call (ignore); a missing block file deletes an orphaned meta file
  (no memory record) or removes the memory record when its own data
  URI is dangling too; a disk-only block file is added to memory with
  the meta file's genstamp or GRANDFATHER_GENERATION_STAMP when the
  meta file is missing; a dangling memory URI adopts the scanned
  copy (updateWithReplica); true duplicates resolve via
  resolveDuplicateReplicas when both metas exist, else the extra
  disk file is deleted; a genstamp difference updates the memory
  genstamp; a length difference reports the block CORRUPT (the one
  externally visible action) and fixes the in-memory length.

Spark-first scale shape: the reference's per-volume sorted merge is
ONE fleet-wide full-outer join on (node, block_id) — the shuffle
provides the sort, every node/volume reconciles in parallel, and the
classification is a single codegen'd CASE cascade. Same shape as
operators/datanodes.block_report_diff (the NameNode-side complement).
Location identity is modeled at volume granularity (the volume stands
in for the replica directory in URI comparisons).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRANDFATHER_GENERATION_STAMP = 0  # HdfsConstants.java


def reconcile(disk: DataFrame, memory: DataFrame) -> DataFrame:
    """Classify every (node, block) into the DirectoryScanner diff
    class and the checkAndUpdate repair action.

    `disk` (one row per scanned on-disk record):
      (node, block_id, volume, has_block_file bool, has_meta_file
      bool, disk_gs long — meta-file genstamp, ignored when the meta
      file is absent, disk_len long, deleting bool — dataset already
      invalidating this block).
    `memory` (the dataset's volumeMap):
      (node, block_id, volume, state — 'FINALIZED'/'RBW'/...,
      mem_gs long, mem_len long, mem_data_exists bool — the record's
      own block URI still resolves).
    Returns (node, block_id, volume, diff_class, action)."""
    d = disk.select(
        F.col("node").alias("d_node"),
        F.col("block_id").alias("d_block"),
        F.col("volume").alias("d_vol"),
        "has_block_file",
        "has_meta_file",
        # ScanInfo.getGenStamp: GRANDFATHER when the meta file is gone
        F.when(F.col("has_meta_file"), F.col("disk_gs"))
        .otherwise(F.lit(GRANDFATHER_GENERATION_STAMP))
        .cast("long")
        .alias("eff_gs"),
        "disk_len",
        "deleting",
    )
    m = memory.select(
        F.col("node").alias("m_node"),
        F.col("block_id").alias("m_block"),
        F.col("volume").alias("m_vol"),
        (F.col("state") == "FINALIZED").alias("finalized"),
        "mem_gs",
        "mem_len",
        "mem_data_exists",
    )
    j = d.join(
        m,
        (d["d_node"] == m["m_node"]) & (d["d_block"] == m["m_block"]),
        "full_outer",
    )
    disk_present = F.col("d_block").isNotNull()
    mem_present = F.col("m_block").isNotNull()
    # scan() merges disk against the FINALIZED memory list only
    in_scan_memory = mem_present & F.col("finalized")
    gs_len_mismatch = (F.col("eff_gs") != F.col("mem_gs")) | (
        F.col("disk_len") != F.col("mem_len")
    )
    loc_mismatch = (F.col("d_vol") != F.col("m_vol")) | ~F.col(
        "mem_data_exists"
    )
    diff = (
        F.when(
            disk_present & ~in_scan_memory,
            F.when(F.col("deleting"), F.lit("IGNORED_DELETING")).otherwise(
                F.lit("MISSING_IN_MEMORY")
            ),
        )
        .when(~disk_present & ~F.col("finalized"),
              F.lit("IGNORED_NOT_FINALIZED"))
        .when(~disk_present, F.lit("MISSING_ON_DISK"))
        # matched + finalized, in the reference's check order
        .when(~F.col("has_block_file"), F.lit("META_ONLY"))
        .when(gs_len_mismatch, F.lit("MISMATCH"))
        .when(loc_mismatch, F.lit("DUPLICATE"))
        .otherwise(F.lit("CLEAN"))
    )
    action = (
        F.when(
            diff == "MISSING_IN_MEMORY",
            # checkAndUpdate re-reads the volumeMap: a non-FINALIZED
            # record found there ends the call
            F.when(mem_present, F.lit("IGNORE_NOT_FINALIZED"))
            .when(F.col("has_block_file"), F.lit("ADD_TO_MEMORY"))
            .when(F.col("has_meta_file"), F.lit("DELETE_ORPHAN_META"))
            .otherwise(F.lit("NONE")),
        )
        .when(
            diff.isin("MISSING_ON_DISK", "META_ONLY"),
            # the record survives if its own data URI still resolves
            F.when(F.col("mem_data_exists"), F.lit("NONE")).otherwise(
                F.lit("REMOVE_FROM_MEMORY")
            ),
        )
        .when(
            diff == "MISMATCH",
            # corrupt report is the externally visible action; a pure
            # genstamp drift just rewrites the in-memory stamp
            F.when(
                F.col("disk_len") != F.col("mem_len"),
                F.lit("REPORT_CORRUPT"),
            ).otherwise(F.lit("UPDATE_GENSTAMP")),
        )
        .when(
            diff == "DUPLICATE",
            F.when(~F.col("mem_data_exists"), F.lit("ADOPT_DISK_COPY"))
            .when(F.col("has_meta_file"), F.lit("RESOLVE_DUPLICATE"))
            .otherwise(F.lit("DELETE_DUPLICATE")),
        )
        .otherwise(F.lit("NONE"))
    )
    return j.select(
        F.coalesce("d_node", "m_node").alias("node"),
        F.coalesce("d_block", "m_block").alias("block_id"),
        F.coalesce("d_vol", "m_vol").alias("volume"),
        diff.alias("diff_class"),
        action.alias("action"),
    )


def scan_stats(diffed: DataFrame) -> DataFrame:
    """The per-node Stats record the scanner logs
    (DirectoryScanner.java:199-230): total blocks scanned and the
    diff-class counters. One partial-agg groupBy."""
    c = F.col("diff_class")
    return diffed.groupBy("node").agg(
        F.count(F.lit(1)).alias("total_records"),
        F.sum((c == "MISSING_IN_MEMORY").cast("long")).alias(
            "missing_memory_blocks"
        ),
        F.sum((c == "MISSING_ON_DISK").cast("long")).alias(
            "missing_disk_blocks"
        ),
        F.sum((c == "MISMATCH").cast("long")).alias("mismatch_blocks"),
        F.sum((c == "DUPLICATE").cast("long")).alias("duplicate_blocks"),
        F.sum((c == "META_ONLY").cast("long")).alias("missing_block_files"),
    )
