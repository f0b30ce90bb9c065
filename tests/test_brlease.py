"""Block-report lease pins (BlockReportLeaseManager.checkLease:295-331
verdict order; requestLease:223-268 self-removal + prune + maxPending;
pruneIfExpired:270-281 expiry boundary now >= leaseTime + expiryMs)."""

from __future__ import annotations

from hadoop_source_spark.operators import brlease

NOW = 1_000_000
EXPIRY = 600_000

LEASE_SCHEMA = (
    "cluster_id long, dn_uuid string, lease_id long, lease_time_ms long"
)
REPORT_SCHEMA = (
    "report_id long, cluster_id long, dn_uuid string,"
    " lease_id_used long, now_ms long"
)
REQ_SCHEMA = "req_id long, cluster_id long, dn_uuid string, now_ms long"


def _check(spark, reports, leases):
    out = brlease.check_leases(
        spark.createDataFrame(reports, REPORT_SCHEMA),
        spark.createDataFrame(leases, LEASE_SCHEMA),
        expiry_ms=EXPIRY,
    ).collect()
    return {r["report_id"]: r["verdict"] for r in out}


def test_check_verdict_order(spark):
    leases = [
        (0, "dn1", 7, NOW - 10),       # fresh, id 7
        (0, "dn2", 0, 0),              # registered, no pending lease
        (0, "dn3", 9, NOW - EXPIRY),   # exactly at expiry -> expired
        (0, "dn4", 5, NOW - EXPIRY + 1),  # one ms inside -> valid
    ]
    got = _check(spark, [
        (0, 0, "dn1", 7, NOW),    # matching -> ACCEPT
        (1, 0, "dn1", 8, NOW),    # wrong id
        (2, 0, "dn9", 7, NOW),    # unknown node
        (3, 0, "dn2", 7, NOW),    # no pending lease
        (4, 0, "dn3", 9, NOW),    # expired (boundary: now == lt+expiry)
        (5, 0, "dn4", 5, NOW),    # just inside expiry -> ACCEPT
        # id 0 bypasses EVERYTHING, even an unknown node (:297-301
        # returns before the node lookup)
        (6, 0, "dnX", 0, NOW),
        (7, 0, "dn3", 0, NOW),    # bypass beats expired too
    ], leases)
    assert got[0] == "ACCEPT"
    assert got[1] == "REJECT_WRONG_ID"
    assert got[2] == "REJECT_UNKNOWN_NODE"
    assert got[3] == "REJECT_NO_LEASE"
    assert got[4] == "REJECT_EXPIRED"
    assert got[5] == "ACCEPT"
    assert got[6] == "ACCEPT_BYPASS"
    assert got[7] == "ACCEPT_BYPASS"


def test_check_same_dn_name_in_other_cluster_is_unknown(spark):
    got = _check(
        spark,
        [(0, 1, "dn1", 7, NOW)],
        [(0, "dn1", 7, NOW - 10)],
    )
    assert got[0] == "REJECT_UNKNOWN_NODE"


def _request(spark, requests, leases, max_pending=2):
    out = brlease.request_leases(
        spark.createDataFrame(requests, REQ_SCHEMA),
        spark.createDataFrame(leases, LEASE_SCHEMA),
        max_pending=max_pending,
        expiry_ms=EXPIRY,
    ).collect()
    return {r["req_id"]: r for r in out}


def test_request_own_lease_removed_before_counting(spark):
    # dn1 holds one of the 2 active leases; re-requesting must not
    # count itself (requestLease:231-239 remove-first), so it is
    # GRANTED while a third node is DENIED.
    leases = [
        (0, "dn1", 7, NOW - 10),
        (0, "dn2", 8, NOW - 10),
    ]
    got = _request(spark, [
        (0, 0, "dn1", NOW),
        (1, 0, "dn3", NOW),
    ], leases)
    assert got[0]["verdict"] == "GRANTED"
    assert got[0]["pending_others"] == 1
    assert not got[0]["registered_now"]
    assert got[1]["verdict"] == "DENIED_MAX_PENDING"
    assert got[1]["pending_others"] == 2
    assert got[1]["registered_now"]


def test_request_prunes_expired_and_ignores_id0(spark):
    leases = [
        (0, "dn1", 7, NOW - EXPIRY),      # expired -> pruned
        (0, "dn2", 0, 0),                 # no lease -> not pending
        (0, "dn3", 9, NOW - 10),          # active
    ]
    got = _request(spark, [(0, 0, "dn9", NOW)], leases, max_pending=2)
    assert got[0]["pending_others"] == 1
    assert got[0]["verdict"] == "GRANTED"


def test_request_empty_cluster_grants(spark):
    got = _request(spark, [(0, 5, "dn1", NOW)], [(0, "dn1", 7, NOW - 10)])
    assert got[0]["pending_others"] == 0
    assert got[0]["verdict"] == "GRANTED"
    assert got[0]["registered_now"]
