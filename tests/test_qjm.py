"""QJM epoch-promise and segment-recovery pins (Journal.newEpoch,
SegmentRecoveryComparator.java:49-89 order)."""

from __future__ import annotations

from hadoop_source_spark.operators import qjm


def _reports(spark, rows):
    return spark.createDataFrame(
        rows,
        "segment long, jn string, state string, end_txid long, "
        "accepted_epoch long, last_writer_epoch long",
    )


def test_epoch_quorum_strictly_greater(spark):
    promises = spark.createDataFrame(
        [("jn0", 3), ("jn1", 4), ("jn2", 5), ("jn3", 2), ("jn4", 5)],
        "jn string, last_promised_epoch long",
    )
    r = qjm.epoch_quorum(promises, writer_epoch=5, n_journals=5).collect()[0]
    # only promises STRICTLY older than 5 accept: jn0, jn1, jn3 = 3 ≥ 3
    assert (r.n_accepting, r.quorum_needed, r.accepted) == (3, 3, True)
    r4 = qjm.epoch_quorum(promises, writer_epoch=4, n_journals=5).collect()[0]
    assert (r4.n_accepting, r4.accepted) == (2, False)


def test_recovery_epoch_dominates_length(spark):
    # jn2 accepted in a NEWER epoch with FEWER txns — it still wins
    # (a prior recovery round chose that value; Paxos safety).
    rows = [
        (100, "jn0", "IN_PROGRESS", 180, 1, 1),
        (100, "jn1", "IN_PROGRESS", 190, 1, 1),
        (100, "jn2", "IN_PROGRESS", 150, 2, 1),
    ]
    out = {r.jn: r for r in
           qjm.segment_recovery_plan(_reports(spark, rows), 5).collect()}
    assert all(r.sync_source == "jn2" and r.sync_end_txid == 150
               for r in out.values())
    assert out["jn0"].action == "TRUNCATE"
    assert out["jn1"].action == "TRUNCATE"
    assert out["jn2"].action == "FINALIZE"
    assert all(r.has_quorum for r in out.values())


def test_recovery_finalized_beats_longer_in_progress(spark):
    # SegmentRecoveryComparator.java:69: a FINALIZED copy is greater
    # than ANY in-progress copy — even one that is longer AND was
    # accepted in a newer epoch. QJM never truncates a finalized
    # segment; the longer in-progress copy truncates instead.
    rows = [
        (400, "jn0", "FINALIZED", 420, 0, 1),
        (400, "jn1", "IN_PROGRESS", 480, 3, 3),
        (400, "jn2", "IN_PROGRESS", 410, 1, 1),
    ]
    out = {r.jn: r for r in
           qjm.segment_recovery_plan(_reports(spark, rows), 5).collect()}
    assert all(r.sync_source == "jn0" and r.sync_end_txid == 420
               for r in out.values())
    assert out["jn0"].action == "FINALIZE"
    assert out["jn1"].action == "TRUNCATE"
    assert out["jn2"].action == "CATCH_UP"
    assert not out["jn0"].finalized_length_mismatch


def test_recovery_last_writer_epoch_counts(spark):
    # SegmentRecoveryComparator.java:83: in-progress copies compare by
    # max(acceptedInEpoch, lastWriterEpoch). jn0 was never part of a
    # recovery accept (accepted=0) but its last WRITER epoch 3 beats
    # jn1's max(2, 1) — the newer writer's copy wins despite being
    # shorter and having the lower acceptedInEpoch.
    rows = [
        (500, "jn0", "IN_PROGRESS", 510, 0, 3),
        (500, "jn1", "IN_PROGRESS", 590, 2, 1),
        (500, "jn2", "IN_PROGRESS", 505, 1, 1),
    ]
    out = {r.jn: r for r in
           qjm.segment_recovery_plan(_reports(spark, rows), 5).collect()}
    assert all(r.sync_source == "jn0" and r.sync_end_txid == 510
               for r in out.values())
    assert out["jn0"].sync_epoch == 3
    assert out["jn1"].action == "TRUNCATE"


def test_recovery_finalized_mismatch_flagged(spark):
    # SegmentRecoveryComparator.java:75 throws AssertionError when two
    # finalized copies disagree on length; the plan surfaces it as a
    # per-segment corruption flag instead of choosing silently.
    rows = [
        (600, "jn0", "FINALIZED", 650, 0, 1),
        (600, "jn1", "FINALIZED", 660, 0, 1),
        (600, "jn2", "IN_PROGRESS", 640, 1, 1),
    ]
    out = {r.jn: r for r in
           qjm.segment_recovery_plan(_reports(spark, rows), 5).collect()}
    assert all(r.finalized_length_mismatch for r in out.values())


def test_recovery_missing_copy_and_quorum_rules(spark):
    rows = [
        # same epoch, all in-progress → longest wins; shorter catch up
        (200, "jn0", "IN_PROGRESS", 250, 1, 1),
        (200, "jn1", "IN_PROGRESS", 260, 1, 1),
        (200, "jn2", "IN_PROGRESS", 240, 1, 1),
        # a JN that responded WITHOUT a copy of the segment
        # (SegmentRecoveryComparator.java:49 — never wins) catches up
        (200, "jn3", None, None, None, None),
        # minority segment: only 2 of 5 reports → unrecoverable
        (300, "jn0", "IN_PROGRESS", 310, 1, 1),
        (300, "jn1", "IN_PROGRESS", 320, 1, 1),
    ]
    out = {(r.segment, r.jn): r for r in
           qjm.segment_recovery_plan(_reports(spark, rows), 5).collect()}
    assert out[(200, "jn1")].action == "FINALIZE"
    assert out[(200, "jn0")].action == "CATCH_UP"
    assert out[(200, "jn2")].action == "CATCH_UP"
    assert out[(200, "jn3")].action == "CATCH_UP"
    assert out[(200, "jn0")].sync_end_txid == 260
    assert out[(300, "jn0")].action == "NO_QUORUM"
    assert not out[(300, "jn1")].has_quorum
