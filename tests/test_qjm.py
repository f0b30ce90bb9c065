"""QJM epoch-promise and segment-recovery pins (Journal.newEpoch,
SegmentRecoveryComparator order)."""

from __future__ import annotations

from hadoop_source_spark.operators import qjm


def _reports(spark, rows):
    return spark.createDataFrame(
        rows,
        "segment long, jn string, state string, end_txid long, "
        "accepted_epoch long",
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
        (100, "jn0", "IN_PROGRESS", 180, 1),
        (100, "jn1", "IN_PROGRESS", 190, 1),
        (100, "jn2", "IN_PROGRESS", 150, 2),
    ]
    out = {r.jn: r for r in
           qjm.segment_recovery_plan(_reports(spark, rows), 5).collect()}
    assert all(r.sync_source == "jn2" and r.sync_end_txid == 150
               for r in out.values())
    assert out["jn0"].action == "TRUNCATE"
    assert out["jn1"].action == "TRUNCATE"
    assert out["jn2"].action == "FINALIZE"
    assert all(r.has_quorum for r in out.values())


def test_recovery_length_and_quorum_rules(spark):
    rows = [
        # same epoch → longest wins; shorter nodes catch up
        (200, "jn0", "FINALIZED", 250, 1),
        (200, "jn1", "FINALIZED", 260, 1),
        (200, "jn2", "FINALIZED", 240, 1),
        # minority segment: only 2 of 5 reports → unrecoverable
        (300, "jn0", "IN_PROGRESS", 310, 1),
        (300, "jn1", "IN_PROGRESS", 320, 1),
    ]
    out = {(r.segment, r.jn): r for r in
           qjm.segment_recovery_plan(_reports(spark, rows), 5).collect()}
    assert out[(200, "jn1")].action == "FINALIZE"
    assert out[(200, "jn0")].action == "CATCH_UP"
    assert out[(200, "jn2")].action == "CATCH_UP"
    assert out[(200, "jn0")].sync_end_txid == 260
    assert out[(300, "jn0")].action == "NO_QUORUM"
    assert not out[(300, "jn1")].has_quorum
