"""Quorum Journal Manager: epoch promises and segment recovery.

Reference semantics (`hdfs/qjournal/server/Journal.java` and
`client/QuorumJournalManager.java`):
- a writer first runs newEpoch(e): each JournalNode PROMISES e only if
  e > its lastPromisedEpoch (`Journal.newEpoch`, :414); the writer
  needs a MAJORITY of promises to write;
- crash recovery for the last in-progress segment
  (`prepareRecovery`/`acceptRecovery`, :784/:836 — Paxos on the
  segment): among the quorum's reports the SYNCED state is chosen by
  `SegmentRecoveryComparator.java:49-89`, in order:
    1. a report that HAS segment state beats one that doesn't (:49);
    2. a FINALIZED copy beats any IN_PROGRESS copy, regardless of
       length (:69 — finalized means a previous writer committed that
       exact length);
    3. two FINALIZED copies MUST agree on endTxId — differing lengths
       are an AssertionError (:75, "finalized segs with different
       lengths");
    4. between IN_PROGRESS copies, the higher
       max(acceptedInEpoch, lastWriterEpoch) wins (:83 — a value
       accepted in a newer recovery round, or written by a newer
       writer, wins even with fewer transactions), then endTxId (:86);
- every JN then syncs its copy to the chosen length: nodes beyond it
  truncate, nodes behind (or without the segment) catch up from a
  synced peer, nodes matching just finalize.

Spark-first: both decisions are segment-keyed aggregations over the
JN-report table (rows = journals × segments — control-plane scale) —
one partial-agg groupBy picks the winner with max_by over the
(has-state, finalized, seen-epoch, endTxId) tuple, broadcast back
onto the reports for per-node actions. No iteration: the Paxos rounds
already happened on the cluster; this resolves their recorded outcome.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def epoch_quorum(promises: DataFrame, writer_epoch: int,
                 n_journals: int) -> DataFrame:
    """newEpoch outcome: promises carries (jn, last_promised_epoch).
    One row out: writer_epoch, n_accepting (JNs whose promise is
    strictly older), quorum_needed, accepted."""
    need = n_journals // 2 + 1
    return promises.agg(
        F.lit(writer_epoch).alias("writer_epoch"),
        F.count(
            F.when(F.col("last_promised_epoch") < writer_epoch, 1)
        ).alias("n_accepting"),
        F.lit(need).alias("quorum_needed"),
        (
            F.count(
                F.when(F.col("last_promised_epoch") < writer_epoch, 1)
            )
            >= need
        ).alias("accepted"),
    )


def segment_recovery_plan(reports: DataFrame, n_journals: int) -> DataFrame:
    """Recovery decision per segment. reports: jn (string), segment
    (bigint — start txid), state ('FINALIZED'|'IN_PROGRESS'|null =
    the JN responded but has no copy of the segment), end_txid,
    accepted_epoch (acceptedInEpoch — 0 unless a previous recovery
    round accepted a value here), last_writer_epoch.

    Output per report row: the segment's chosen (sync_epoch = the
    winner's max(accepted_epoch, last_writer_epoch), sync_end_txid,
    sync_source jn), whether the segment HAS quorum (>= majority of
    reports — an unreachable-minority segment can't recover),
    finalized_length_mismatch (true when two FINALIZED copies
    disagree on end_txid — the reference throws AssertionError on
    this, `SegmentRecoveryComparator.java:75`; callers must treat it
    as corruption), and this node's action: FINALIZE (matches the
    chosen length), TRUNCATE (ahead of it), CATCH_UP (behind it, or
    no copy), or NO_QUORUM.

    The winner follows `SegmentRecoveryComparator.java:49-89` exactly:
    has-state first, then FINALIZED over IN_PROGRESS, then
    max(accepted_epoch, last_writer_epoch), then end_txid, with jn as
    a deterministic tiebreak (the reference's tiebreak is map
    iteration order — any finalized copy is equivalent)."""
    need = n_journals // 2 + 1
    has_state = F.col("state").isNotNull()
    finalized = F.col("state") == F.lit("FINALIZED")
    seen_epoch = F.greatest(
        F.col("accepted_epoch"), F.col("last_writer_epoch")
    )
    key = F.struct(
        has_state.cast("int").alias("h"),
        F.coalesce(finalized.cast("int"), F.lit(0)).alias("f"),
        F.coalesce(seen_epoch, F.lit(-1)).alias("e"),
        F.coalesce(F.col("end_txid"), F.lit(-1)).alias("t"),
        F.col("jn").alias("j"),
    )
    chosen = reports.groupBy("segment").agg(
        F.max_by(
            F.struct(
                seen_epoch.alias("sync_epoch"),
                F.col("end_txid").alias("sync_end_txid"),
                F.col("jn").alias("sync_source"),
            ),
            key,
        ).alias("__c"),
        F.count(F.lit(1)).alias("__n"),
        (
            F.count_distinct(F.when(finalized, F.col("end_txid"))) > 1
        ).alias("__fmis"),
    )
    joined = reports.join(F.broadcast(chosen), "segment")
    action = F.when(F.col("__n") < need, F.lit("NO_QUORUM")).otherwise(
        F.when(
            ~has_state
            | (F.col("end_txid") < F.col("__c.sync_end_txid")),
            F.lit("CATCH_UP"),
        )
        .when(
            F.col("end_txid") > F.col("__c.sync_end_txid"),
            F.lit("TRUNCATE"),
        )
        .otherwise(F.lit("FINALIZE"))
    )
    return joined.select(
        "segment",
        "jn",
        "state",
        "end_txid",
        "accepted_epoch",
        "last_writer_epoch",
        F.col("__c.sync_epoch").alias("sync_epoch"),
        F.col("__c.sync_end_txid").alias("sync_end_txid"),
        F.col("__c.sync_source").alias("sync_source"),
        (F.col("__n") >= need).alias("has_quorum"),
        F.col("__fmis").alias("finalized_length_mismatch"),
        action.alias("action"),
    )
