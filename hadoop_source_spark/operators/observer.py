"""Observer-read routing: consistent reads from standby NameNodes.

Reference semantics: clients route reads to OBSERVER NameNodes
(`hdfs-client/namenode/ha/ObserverReadProxyProvider.java`) but
consistency is gated on transaction ids — the client carries its
last-seen stateId and the server rejects reads it hasn't caught up to
(`hdfs/server/namenode/GlobalStateIdContext.java:136-150`: a client
stateId ahead of the server's triggers retry — in practice the read
falls through to another observer or the Active). msync pins the
client's stateId to the Active's latest (:108-119 auto-msync).

Spark-first: the NameNode fleet is a handful of rows → ONE broadcast
array; every client read picks its serving node in a single HOF
projection — filter observers that have caught up to the client's
stateId, take the lowest-latency one, else fall back to the Active.
Zero shuffles on the read log at any scale."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def route_reads(reads: DataFrame, namenodes: DataFrame) -> DataFrame:
    """reads: client_id/..., last_seen_txid. namenodes: nn (string),
    state ('ACTIVE'|'OBSERVER'|'STANDBY'), applied_txid, latency_ms
    (double). Adds serving_nn, serving_mode ('OBSERVER' |
    'ACTIVE_FALLBACK'), lag_txns (how far the chosen observer's
    applied txid trails the Active — 0 on fallback)."""
    one = namenodes.agg(
        F.collect_list(
            F.struct("nn", "state", "applied_txid", "latency_ms")
        ).alias("__nns")
    )
    best_obs = F.expr(
        "get(array_sort("
        "  filter(__nns, n -> n.state = 'OBSERVER'"
        "         AND n.applied_txid >= last_seen_txid),"
        "  (l, r) -> CASE WHEN l.latency_ms < r.latency_ms THEN -1"
        "                 WHEN l.latency_ms > r.latency_ms THEN 1"
        "                 WHEN l.nn < r.nn THEN -1"
        "                 WHEN l.nn > r.nn THEN 1 ELSE 0 END), 0)"
    )
    active = F.expr("get(filter(__nns, n -> n.state = 'ACTIVE'), 0)")
    out = reads.crossJoin(F.broadcast(one)).withColumn(
        "__obs", best_obs
    ).withColumn("__act", active)
    picked_obs = F.col("__obs").isNotNull()
    return out.select(
        *reads.columns,
        F.when(picked_obs, F.col("__obs.nn"))
        .otherwise(F.col("__act.nn"))
        .alias("serving_nn"),
        F.when(picked_obs, F.lit("OBSERVER"))
        .otherwise(F.lit("ACTIVE_FALLBACK"))
        .alias("serving_mode"),
        F.when(
            picked_obs,
            F.greatest(
                F.col("__act.applied_txid") - F.col("__obs.applied_txid"),
                F.lit(0),
            ),
        )
        .otherwise(F.lit(0))
        .alias("lag_txns"),
    )
