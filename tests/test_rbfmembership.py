"""RBF membership pins (MembershipStoreImpl.getRepresentativeQuorum:
276-312 TreeSet equal-date collapse vs raw-count threshold;
BaseRecord.compareTo:205-211; NamenodePriorityComparator:40-66;
MembershipNamenodeResolver.getRecentRegistrationForQuery:352-383)."""

from __future__ import annotations

from hadoop_source_spark.operators import rbfmembership

SCHEMA = (
    "router_id string, nameservice string, namenode_id string,"
    " state string, date_modified long"
)


def _rep(spark, rows):
    out = rbfmembership.representative_registrations(
        spark.createDataFrame(rows, SCHEMA)
    ).collect()
    return {(r["nameservice"], r["namenode_id"]): r for r in out}


def test_quorum_uses_newest_of_majority(spark):
    rows = [
        ("r0", "ns0", "nn0", "ACTIVE", 100),
        ("r1", "ns0", "nn0", "ACTIVE", 300),
        ("r2", "ns0", "nn0", "ACTIVE", 200),
        ("r3", "ns0", "nn0", "STANDBY", 900),  # newer but minority
        ("r4", "ns0", "nn0", "STANDBY", 950),
    ]
    got = _rep(spark, rows)[("ns0", "nn0")]
    assert got["quorum"] is True
    assert got["rep_state"] == "ACTIVE"
    assert got["rep_router"] == "r1"
    assert got["rep_date"] == 300


def test_equal_dates_collapse_but_raw_count_divides(spark):
    # Three ACTIVE records, two sharing a date -> the TreeSet keeps
    # two distinct dates while the threshold still divides by 5 raw
    # records: 2 > 5/2 fails, so the quorum is LOST and the overall
    # newest record (STANDBY@900) wins.
    rows = [
        ("r0", "ns0", "nn0", "ACTIVE", 100),
        ("r1", "ns0", "nn0", "ACTIVE", 100),
        ("r2", "ns0", "nn0", "ACTIVE", 200),
        ("r3", "ns0", "nn0", "STANDBY", 900),
        ("r4", "ns0", "nn0", "UNAVAILABLE", 50),
    ]
    got = _rep(spark, rows)[("ns0", "nn0")]
    assert got["quorum"] is False
    assert got["rep_state"] == "STANDBY"
    assert got["rep_date"] == 900


def test_no_quorum_overall_newest_state_ordinal_tiebreak(spark):
    # Two states tie on the newest date: the pinned tie-break takes
    # the smaller service-state ordinal (ACTIVE over STANDBY).
    rows = [
        ("r0", "ns0", "nn0", "STANDBY", 500),
        ("r1", "ns0", "nn0", "ACTIVE", 500),
        ("r2", "ns0", "nn0", "OBSERVER", 100),
        ("r3", "ns0", "nn0", "UNAVAILABLE", 200),
        ("r4", "ns0", "nn0", "EXPIRED", 300),
    ]
    got = _rep(spark, rows)[("ns0", "nn0")]
    assert got["quorum"] is False
    assert got["rep_state"] == "ACTIVE"


def test_priority_order_and_expired_drop(spark):
    rows = [
        # ns0 has four NNs, one per state; EXPIRED nn is dropped.
        ("r0", "ns0", "a", "STANDBY", 10),
        ("r0", "ns0", "b", "ACTIVE", 5),
        ("r0", "ns0", "c", "OBSERVER", 99),
        ("r0", "ns0", "d", "EXPIRED", 999),
        # two ACTIVE NNs in ns1: newest date first.
        ("r0", "ns1", "x", "ACTIVE", 100),
        ("r0", "ns1", "y", "ACTIVE", 200),
    ]
    reps = rbfmembership.representative_registrations(
        spark.createDataFrame(rows, SCHEMA)
    )
    out = rbfmembership.namenode_priority(reps).collect()
    got = {(r["nameservice"], r["namenode_id"]): r["priority"]
           for r in out}
    assert got[("ns0", "b")] == 1      # ACTIVE first despite oldest
    assert got[("ns0", "c")] == 2      # OBSERVER before STANDBY
    assert got[("ns0", "a")] == 3
    assert ("ns0", "d") not in got     # EXPIRED dropped
    assert got[("ns1", "y")] == 1 and got[("ns1", "x")] == 2
    out2 = rbfmembership.namenode_priority(
        reps, show_unavailable=False
    ).collect()
    assert all(r["rep_state"] != "UNAVAILABLE" for r in out2)
