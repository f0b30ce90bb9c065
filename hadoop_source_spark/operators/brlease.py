"""Block-report lease admission: how the NameNode rate-limits full
block reports from DataNodes.

Reference semantics (`hadoop-hdfs/.../blockmanagement/
BlockReportLeaseManager.java`):

- ``checkLease:295-331`` order: lease id 0 BYPASSES rate limiting
  entirely (:297-301); an unknown datanode rejects; a node with no
  pending lease (leaseId 0) rejects; an expired lease
  (``pruneIfExpired:270-281``: now >= leaseTime + leaseExpiryMs)
  rejects and is pruned; a mismatched id rejects; otherwise the
  report is admitted.
- ``requestLease:223-268``: an unregistered requester is registered
  on the spot (:225-230); any existing lease the requester holds is
  removed FIRST (:231-239 — a restarted DN re-requesting does not
  count against itself); expired pending leases are pruned; then the
  request is denied with id 0 when the cluster-wide pending count
  has reached maxPending, else a fresh lease is granted. (This
  models one admission step against the snapshot — the reference
  serializes grants under the manager lock.)

Spark-first: the check path is one (cluster, dn) equi-join plus a
codegen when-chain; the admission path counts active leases with a
cluster-keyed conditional join+aggregate whose per-cluster work is
bounded by the (operationally pinned) cluster size — both shuffle
once on the cluster key and scale linearly with cluster count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACCEPT = "ACCEPT"
ACCEPT_BYPASS = "ACCEPT_BYPASS"
REJECT_UNKNOWN_NODE = "REJECT_UNKNOWN_NODE"
REJECT_NO_LEASE = "REJECT_NO_LEASE"
REJECT_EXPIRED = "REJECT_EXPIRED"
REJECT_WRONG_ID = "REJECT_WRONG_ID"
GRANTED = "GRANTED"
DENIED_MAX_PENDING = "DENIED_MAX_PENDING"


def check_leases(
    reports: DataFrame, leases: DataFrame, *, expiry_ms: int
) -> DataFrame:
    """Admission verdict per incoming block report.

    ``reports``: (report_id, cluster_id, dn_uuid, lease_id_used
    long, now_ms long). ``leases``: (cluster_id, dn_uuid, lease_id
    long — 0 when none pending, lease_time_ms long).

    Returns (report_id, verdict)."""
    j = reports.join(
        leases.withColumnRenamed("lease_id", "_lease")
        .withColumnRenamed("lease_time_ms", "_lt")
        .withColumn("_known", F.lit(True)),
        ["cluster_id", "dn_uuid"],
        "left",
    )
    verdict = (
        F.when(F.col("lease_id_used") == 0, ACCEPT_BYPASS)
        .when(F.col("_known").isNull(), REJECT_UNKNOWN_NODE)
        .when(F.col("_lease") == 0, REJECT_NO_LEASE)
        .when(
            F.col("now_ms") >= F.col("_lt") + expiry_ms, REJECT_EXPIRED
        )
        .when(F.col("lease_id_used") != F.col("_lease"), REJECT_WRONG_ID)
        .otherwise(ACCEPT)
    )
    return j.select("report_id", verdict.alias("verdict"))


def request_leases(
    requests: DataFrame,
    leases: DataFrame,
    *,
    max_pending: int,
    expiry_ms: int,
) -> DataFrame:
    """Grant/deny one lease request per row against the snapshot.

    ``requests``: (req_id, cluster_id, dn_uuid, now_ms).

    Returns (req_id, registered_now boolean — the requester was
    unknown and registered on the spot, pending_others int — active
    unexpired leases held by OTHER nodes after pruning, verdict)."""
    others = (
        requests.alias("r")
        .join(leases.alias("l"), "cluster_id", "left")
        .where(
            F.col("l.dn_uuid").isNull()
            | (
                (F.col("l.dn_uuid") != F.col("r.dn_uuid"))
                & (F.col("l.lease_id") != 0)
                & (F.col("r.now_ms") < F.col("l.lease_time_ms") + expiry_ms)
            )
        )
        .groupBy("req_id")
        .agg(
            F.sum(
                F.when(F.col("l.dn_uuid").isNotNull(), 1).otherwise(0)
            ).cast("int").alias("pending_others")
        )
    )
    known = requests.join(
        leases.select(
            "cluster_id", "dn_uuid", F.lit(True).alias("_known")
        ),
        ["cluster_id", "dn_uuid"],
        "left",
    )
    j = known.join(others, "req_id", "left")
    pending = F.coalesce(F.col("pending_others"), F.lit(0))
    return j.select(
        "req_id",
        F.col("_known").isNull().alias("registered_now"),
        pending.alias("pending_others"),
        F.when(pending >= max_pending, DENIED_MAX_PENDING)
        .otherwise(GRANTED)
        .alias("verdict"),
    )
