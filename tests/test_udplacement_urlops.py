"""Upgrade-domain placement pins (BlockPlacementStatusDefault.java:34,
BlockPlacementStatusWithUpgradeDomain.java:56-109) and URL-curation
pins (llmops/urlops)."""

from __future__ import annotations

from hadoop_source_spark.llmops import urlops
from hadoop_source_spark.operators import placement

REP_SCHEMA = (
    "block_id long, replication int, node string, rack string,"
    " upgrade_domain string"
)


def _verify(spark, rows, factor=3):
    out = placement.verify_placement_upgrade_domain(
        spark.createDataFrame(rows, REP_SCHEMA), factor
    ).collect()
    return {r["block_id"]: r for r in out}


def test_placement_matrix(spark):
    got = _verify(
        spark,
        [
            # block 1: 3 replicas, 3 racks, 3 uds -> satisfied
            (1, 3, "n1", "r1", "u1"), (1, 3, "n2", "r2", "u2"),
            (1, 3, "n3", "r3", "u3"),
            # block 2: one rack, 3 uds -> rack leg fails (needs 2)
            (2, 3, "n1", "r1", "u1"), (2, 3, "n4", "r1", "u2"),
            (2, 3, "n5", "r1", "u3"),
            # block 3: 2 racks, 1 ud -> ud leg fails, needs 3-1=2 more
            (3, 3, "n1", "r1", "u1"), (3, 3, "n2", "r2", "u1"),
            (3, 3, "n6", "r2", "u1"),
            # block 4: replication 5 > factor: 3 uds suffice
            (4, 5, "n1", "r1", "u1"), (4, 5, "n2", "r2", "u2"),
            (4, 5, "n3", "r3", "u3"), (4, 5, "n7", "r1", "u1"),
            (4, 5, "n8", "r2", "u2"),
        ],
    )
    assert got[1]["satisfied"] is True
    assert got[2]["rack_ok"] is False and got[2]["ud_ok"] is True
    assert got[2]["additional_replicas_required"] == 1  # 2 - 1 rack
    assert got[3]["rack_ok"] is True and got[3]["ud_ok"] is False
    assert got[3]["additional_replicas_required"] == 2  # 3 - 1 uds
    assert got[4]["satisfied"] is True


def test_placement_additional_is_max_of_legs(spark):
    # one rack AND one ud at replication 3: rack deficit 1, ud
    # deficit 2 -> max = 2
    got = _verify(
        spark,
        [
            (1, 3, "n1", "r1", "u1"), (1, 3, "n2", "r1", "u1"),
            (1, 3, "n3", "r1", "u1"),
            # second block makes the cluster multi-rack
            (2, 3, "n4", "r2", "u2"), (2, 3, "n5", "r3", "u3"),
            (2, 3, "n6", "r4", "u4"),
        ],
    )
    assert got[1]["additional_replicas_required"] == 2


def test_placement_single_rack_cluster_passes(spark):
    # n_racks >= total cluster racks: the one-rack cluster is exempt
    got = _verify(
        spark,
        [(1, 3, "n1", "r1", "u1"), (1, 3, "n2", "r1", "u2"),
         (1, 3, "n3", "r1", "u3")],
    )
    assert got[1]["rack_ok"] is True and got[1]["satisfied"] is True


def test_url_canonicalization_unifies_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "https://WWW.Ex.COM:443/a/b/?utm_source=z#frag", 1.0),
            (2, "http://ex.com:80/a/b", 1.0),
            (3, "https://ex.com/a/b/", 1.0),
            (4, "https://sub.www.ex.com/a", 1.0),  # inner www kept
        ],
        "doc_id long, url string, quality double",
    )
    out = urlops.url_pipeline(
        df, spark.createDataFrame([("none",)], "domain string"), 10
    ).collect()
    got = {r["doc_id"]: r for r in out}
    assert got[1]["canon_url"] == "ex.com/a/b"
    assert got[1]["action"] == "KEPT"          # lowest doc_id wins
    assert got[2]["action"] == "URL_DUP"
    assert got[3]["action"] == "URL_DUP"
    assert got[4]["domain"] == "sub.www.ex.com"


def test_port_strip_is_host_anchored(spark):
    # the :80/:443 strip must only fire in the authority position —
    # a literal ':80' inside a path segment and a real ':8080' port
    # are both preserved (regression: an unanchored replace-all
    # mangled 'example.com/a:80/b' into 'example.com/a/b')
    df = spark.createDataFrame(
        [
            (1, "http://ex.com/a:80/b", 1.0),
            (2, "http://ex.com:8080/a", 1.0),
            (3, "http://ex.com:80/a:443/b", 1.0),
        ],
        "doc_id long, url string, quality double",
    )
    out = urlops.url_pipeline(
        df, spark.createDataFrame([("none",)], "domain string"), 10
    ).collect()
    got = {r["doc_id"]: r["canon_url"] for r in out}
    assert got[1] == "ex.com/a:80/b"
    assert got[2] == "ex.com:8080/a"
    assert got[3] == "ex.com/a:443/b"  # host port gone, path ':443' kept


def test_url_blocklist_and_cap_count_only_survivors(spark):
    rows = [(i, f"https://big.com/p{i}", float(100 - i)) for i in range(6)]
    rows += [(10, "https://big.com/p0", 999.0)]   # dup of doc 0's URL
    rows += [(20, "https://bad.com/x", 1.0)]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, quality double"
    )
    out = urlops.url_pipeline(
        df, spark.createDataFrame([("bad.com",)], "domain string"), 5
    ).collect()
    got = {r["doc_id"]: r["action"] for r in out}
    assert got[20] == "BLOCKLISTED"
    assert got[10] == "URL_DUP"  # despite its higher quality
    # docs 0..4 keep (ranked by quality desc = doc_id asc), 5 over cap
    assert [got[i] for i in range(6)] == ["KEPT"] * 5 + ["OVER_CAP"]
