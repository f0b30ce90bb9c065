"""Re-encryption pins (ReencryptionHandler.processFileInode:640-668;
EDEKReencryptCallable:560-580 atomic batch failure;
restoreFromLastProcessedFile:465-476; checkINodeReady:672-690)."""

from __future__ import annotations

from hadoop_source_spark.operators import reencryption

ZONES_SCHEMA = (
    "zone_id long, ez_key_version string, canceled boolean,"
    " last_processed string"
)
FILES_SCHEMA = (
    "zone_id long, path string, fe_version string, kms_fault boolean"
)


def _plan(spark, zones, files, batch_size=2):
    out = reencryption.batch_plan(
        spark.createDataFrame(zones, ZONES_SCHEMA),
        spark.createDataFrame(files, FILES_SCHEMA),
        batch_size=batch_size,
    ).collect()
    return {r["path"]: r for r in out}


def test_verdict_chain_and_batch_numbering(spark):
    zones = [(0, "v2", False, "/f02")]
    files = [
        (0, "/f01", "v1", False),   # at/under checkpoint -> skipped
        (0, "/f02", "v1", False),   # boundary: <= is skipped
        (0, "/f03", None, False),   # unencrypted
        (0, "/f04", "v2", False),   # already current
        (0, "/f05", "v1", False),   # batch 0
        (0, "/f06", "v1", False),   # batch 0
        (0, "/f07", "v1", False),   # batch 1 — skips don't consume slots
    ]
    got = _plan(spark, zones, files)
    assert got["/f01"]["verdict"] == reencryption.SKIP_CHECKPOINTED
    assert got["/f02"]["verdict"] == reencryption.SKIP_CHECKPOINTED
    assert got["/f03"]["verdict"] == reencryption.SKIP_NOT_ENCRYPTED
    assert got["/f04"]["verdict"] == reencryption.SKIP_CURRENT_VERSION
    assert got["/f05"]["batch_id"] == 0
    assert got["/f06"]["batch_id"] == 0
    assert got["/f07"]["batch_id"] == 1
    assert all(
        got[p]["verdict"] == reencryption.REENCRYPTED
        for p in ("/f05", "/f06", "/f07")
    )


def test_batch_fails_atomically_and_only_that_batch(spark):
    zones = [(0, "v2", False, None)]
    files = [
        (0, "/f1", "v1", False),
        (0, "/f2", "v1", True),    # poisons batch 0 only
        (0, "/f3", "v1", False),
        (0, "/f4", "v1", False),
    ]
    got = _plan(spark, zones, files)
    assert got["/f1"]["verdict"] == reencryption.BATCH_FAILED
    assert got["/f2"]["verdict"] == reencryption.BATCH_FAILED
    assert got["/f3"]["verdict"] == reencryption.REENCRYPTED
    assert got["/f4"]["verdict"] == reencryption.REENCRYPTED


def test_canceled_zone_and_report(spark):
    zones = [(0, "v2", True, None), (1, "v2", False, None)]
    files = [
        (0, "/a", "v1", False),
        (1, "/b", "v1", True),
        (1, "/c", "v1", False),
        (1, "/d", "v2", False),
    ]
    plan = reencryption.batch_plan(
        spark.createDataFrame(zones, ZONES_SCHEMA),
        spark.createDataFrame(files, FILES_SCHEMA),
        batch_size=2,
    )
    got = {r["path"]: r for r in plan.collect()}
    assert got["/a"]["verdict"] == reencryption.ZONE_CANCELED
    assert got["/a"]["batch_id"] is None
    rep = {
        r["zone_id"]: r
        for r in reencryption.zone_report(plan).collect()
    }
    assert rep[1]["files_failed"] == 2
    assert rep[1]["batches_failed"] == 1  # per-batch, not per-file
    assert rep[1]["batches_submitted"] == 1
    assert rep[1]["files_skipped"] == 1
    assert rep[0]["files_reencrypted"] == 0
