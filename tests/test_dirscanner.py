"""DirectoryScanner reconciliation pins (DirectoryScanner.java:457-552
scan order, FsDatasetImpl.java:2410-2608 checkAndUpdate decisions)."""

from __future__ import annotations

from hadoop_source_spark.operators import dirscanner

DISK_SCHEMA = (
    "node string, block_id long, volume string, has_block_file boolean,"
    " has_meta_file boolean, disk_gs long, disk_len long, deleting boolean"
)
MEM_SCHEMA = (
    "node string, block_id long, volume string, state string,"
    " mem_gs long, mem_len long, mem_data_exists boolean"
)


def _run(spark, disk, memory):
    out = dirscanner.reconcile(
        spark.createDataFrame(disk, DISK_SCHEMA),
        spark.createDataFrame(memory, MEM_SCHEMA),
    ).collect()
    return {r["block_id"]: (r["diff_class"], r["action"]) for r in out}


def test_disk_only_classes(spark):
    got = _run(
        spark,
        [
            ("dn1", 1, "v0", True, True, 100, 10, False),   # add
            ("dn1", 2, "v0", True, False, 100, 10, False),  # add, no meta
            ("dn1", 3, "v0", False, True, 100, 10, False),  # orphan meta
            ("dn1", 4, "v0", True, True, 100, 10, True),    # deleting: skip
        ],
        [],
    )
    assert got[1] == ("MISSING_IN_MEMORY", "ADD_TO_MEMORY")
    assert got[2] == ("MISSING_IN_MEMORY", "ADD_TO_MEMORY")
    assert got[3] == ("MISSING_IN_MEMORY", "DELETE_ORPHAN_META")
    assert got[4] == ("IGNORED_DELETING", "NONE")


def test_memory_only_classes(spark):
    got = _run(
        spark,
        [],
        [
            ("dn1", 1, "v0", "FINALIZED", 100, 10, True),   # URI ok: keep
            ("dn1", 2, "v0", "FINALIZED", 100, 10, False),  # dangling: rm
            ("dn1", 3, "v0", "RBW", 100, 10, True),         # not in scan
        ],
    )
    assert got[1] == ("MISSING_ON_DISK", "NONE")
    assert got[2] == ("MISSING_ON_DISK", "REMOVE_FROM_MEMORY")
    assert got[3] == ("IGNORED_NOT_FINALIZED", "NONE")


def test_non_finalized_disk_hit_is_ignored(spark):
    # scan merges against the FINALIZED list only, so the disk record
    # surfaces as missing-in-memory; checkAndUpdate then finds the RBW
    # replica in the volumeMap and ends the call
    got = _run(
        spark,
        [("dn1", 1, "v0", True, True, 100, 10, False)],
        [("dn1", 1, "v0", "RBW", 100, 10, True)],
    )
    assert got[1] == ("MISSING_IN_MEMORY", "IGNORE_NOT_FINALIZED")


def test_meta_only_checked_before_mismatch(spark):
    # scan's order: block-file-absent first — even with a genstamp
    # drift the record classifies META_ONLY, and the dangling memory
    # URI removes the record
    got = _run(
        spark,
        [("dn1", 1, "v0", False, True, 999, 10, False),
         ("dn1", 2, "v0", False, True, 999, 10, False)],
        [("dn1", 1, "v0", "FINALIZED", 100, 10, False),
         ("dn1", 2, "v0", "FINALIZED", 100, 10, True)],
    )
    assert got[1] == ("META_ONLY", "REMOVE_FROM_MEMORY")
    assert got[2] == ("META_ONLY", "NONE")


def test_mismatch_corrupt_beats_genstamp(spark):
    got = _run(
        spark,
        [
            ("dn1", 1, "v0", True, True, 101, 10, False),  # gs only
            ("dn1", 2, "v0", True, True, 100, 99, False),  # len -> corrupt
            ("dn1", 3, "v0", True, True, 101, 99, False),  # both -> corrupt
            ("dn1", 4, "v0", True, False, 100, 10, False), # no meta: eff 0
        ],
        [
            ("dn1", 1, "v0", "FINALIZED", 100, 10, True),
            ("dn1", 2, "v0", "FINALIZED", 100, 10, True),
            ("dn1", 3, "v0", "FINALIZED", 100, 10, True),
            ("dn1", 4, "v0", "FINALIZED", 100, 10, True),
        ],
    )
    assert got[1] == ("MISMATCH", "UPDATE_GENSTAMP")
    assert got[2] == ("MISMATCH", "REPORT_CORRUPT")
    assert got[3] == ("MISMATCH", "REPORT_CORRUPT")
    # GRANDFATHER_GENERATION_STAMP (0) vs memory's 100
    assert got[4] == ("MISMATCH", "UPDATE_GENSTAMP")


def test_mismatch_checked_before_duplicate(spark):
    # gs/len compare precedes the location compare in scan
    got = _run(
        spark,
        [("dn1", 1, "v0", True, True, 101, 10, False)],
        [("dn1", 1, "v9", "FINALIZED", 100, 10, True)],
    )
    assert got[1] == ("MISMATCH", "UPDATE_GENSTAMP")


def test_duplicate_resolution_matrix(spark):
    got = _run(
        spark,
        [
            ("dn1", 1, "v0", True, True, 100, 10, False),   # both metas
            ("dn1", 2, "v0", True, False, 0, 10, False),    # no disk meta
            ("dn1", 3, "v0", True, True, 100, 10, False),   # dangling mem
        ],
        [
            ("dn1", 1, "v9", "FINALIZED", 100, 10, True),
            ("dn1", 2, "v9", "FINALIZED", 0, 10, True),
            ("dn1", 3, "v0", "FINALIZED", 100, 10, False),
        ],
    )
    assert got[1] == ("DUPLICATE", "RESOLVE_DUPLICATE")
    assert got[2] == ("DUPLICATE", "DELETE_DUPLICATE")
    assert got[3] == ("DUPLICATE", "ADOPT_DISK_COPY")


def test_clean_and_stats(spark):
    disk = spark.createDataFrame(
        [
            ("dn1", 1, "v0", True, True, 100, 10, False),   # clean
            ("dn1", 2, "v0", True, True, 101, 10, False),   # mismatch
            ("dn1", 3, "v0", True, True, 100, 10, False),   # disk-only
            ("dn2", 4, "v0", False, True, 100, 10, False),  # meta-only
        ],
        DISK_SCHEMA,
    )
    memory = spark.createDataFrame(
        [
            ("dn1", 1, "v0", "FINALIZED", 100, 10, True),
            ("dn1", 2, "v0", "FINALIZED", 100, 10, True),
            ("dn2", 4, "v0", "FINALIZED", 100, 10, True),
            ("dn2", 5, "v0", "FINALIZED", 100, 10, True),   # mem-only
        ],
        MEM_SCHEMA,
    )
    diffed = dirscanner.reconcile(disk, memory)
    got = {r["block_id"]: r["diff_class"] for r in diffed.collect()}
    assert got[1] == "CLEAN"
    stats = {r["node"]: r for r in dirscanner.scan_stats(diffed).collect()}
    assert stats["dn1"]["total_records"] == 3
    assert stats["dn1"]["mismatch_blocks"] == 1
    assert stats["dn1"]["missing_memory_blocks"] == 1
    assert stats["dn2"]["missing_disk_blocks"] == 1
    assert stats["dn2"]["missing_block_files"] == 1
