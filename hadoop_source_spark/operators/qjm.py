"""Quorum Journal Manager: epoch promises and segment recovery.

Reference semantics (`hdfs/qjournal/server/Journal.java` and
`client/QuorumJournalManager.java`):
- a writer first runs newEpoch(e): each JournalNode PROMISES e only if
  e > its lastPromisedEpoch (`Journal.newEpoch`, :414); the writer
  needs a MAJORITY of promises to write;
- crash recovery for the last in-progress segment
  (`prepareRecovery`/`acceptRecovery`, :784/:836 — Paxos on the
  segment): among the quorum's reports the SYNCED state is the one
  with the highest (acceptedInEpoch, endTxId) — a value accepted in a
  newer epoch wins even with fewer transactions, because a previous
  recovery round already chose it (`SegmentRecoveryComparator`);
- every JN then finalizes its copy to the chosen length: nodes beyond
  it truncate, nodes behind it catch up from a synced peer, nodes
  matching just finalize.

Spark-first: both decisions are segment-keyed aggregations over the
JN-report table (rows = journals × segments — control-plane scale) —
one partial-agg groupBy picks the winner with max_by over the
(epoch, endTxId) pair, broadcast back onto the reports for per-node
actions. No iteration: the Paxos rounds already happened on the
cluster; this resolves their recorded outcome.
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
    (bigint — start txid), state ('FINALIZED'|'IN_PROGRESS'),
    end_txid, accepted_epoch.

    Output per report row: the segment's chosen (sync_epoch,
    sync_end_txid, sync_source jn), whether the segment HAS quorum
    (>= majority of reports — an unreachable-minority segment can't
    recover), and this node's action: FINALIZE (matches the chosen
    length), TRUNCATE (ahead of it), CATCH_UP (behind it), or
    NO_QUORUM. The winner is max by (accepted_epoch, end_txid) with
    jn as a deterministic tiebreak, exactly
    SegmentRecoveryComparator's order."""
    need = n_journals // 2 + 1
    key = F.struct(
        F.col("accepted_epoch").alias("e"),
        F.col("end_txid").alias("t"),
        F.col("jn").alias("j"),
    )
    chosen = reports.groupBy("segment").agg(
        F.max_by(
            F.struct(
                F.col("accepted_epoch").alias("sync_epoch"),
                F.col("end_txid").alias("sync_end_txid"),
                F.col("jn").alias("sync_source"),
            ),
            key,
        ).alias("__c"),
        F.count(F.lit(1)).alias("__n"),
    )
    joined = reports.join(F.broadcast(chosen), "segment")
    action = F.when(F.col("__n") < need, F.lit("NO_QUORUM")).otherwise(
        F.when(
            F.col("end_txid") > F.col("__c.sync_end_txid"),
            F.lit("TRUNCATE"),
        )
        .when(
            F.col("end_txid") < F.col("__c.sync_end_txid"),
            F.lit("CATCH_UP"),
        )
        .otherwise(F.lit("FINALIZE"))
    )
    return joined.select(
        "segment",
        "jn",
        "state",
        "end_txid",
        "accepted_epoch",
        F.col("__c.sync_epoch").alias("sync_epoch"),
        F.col("__c.sync_end_txid").alias("sync_end_txid"),
        F.col("__c.sync_source").alias("sync_source"),
        (F.col("__n") >= need).alias("has_quorum"),
        action.alias("action"),
    )
