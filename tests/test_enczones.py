"""Encryption-zone resolution + rename validity pins
(EncryptionZoneManager.java:391-431, 440-446, 477-531)."""

from __future__ import annotations

from hadoop_source_spark.operators import enczones


def _zones(spark):
    return spark.createDataFrame(
        [
            ("/a", "key-a", "AES/CTR/NoPadding", "Completed"),
            ("/a/inner", "key-inner", "AES/CTR/NoPadding", "Completed"),
            ("/re", "key-re", "AES/CTR/NoPadding", "Submitted"),
        ],
        "zone_path string, key_name string, suite string, reenc_state string",
    )


def test_resolve_nearest_ancestor_and_self(spark):
    paths = spark.createDataFrame(
        [
            ("/a/inner/f1", False),     # nested zone shadows outer
            ("/a/other/f2", False),     # outer zone
            ("/a/inner", True),         # zone-root DIR resolves to itself
            ("/a/inner", False),        # same path as FILE: ancestors only
            ("/free/f3", False),        # no zone
            ("/a", True),               # outer root resolves to itself
        ],
        "path string, is_dir boolean",
    )
    rows = enczones.resolve_zones(paths, _zones(spark)).collect()
    got = {(r["path"], r["is_dir"]): r["zone_path"] for r in rows}
    assert got[("/a/inner/f1", False)] == "/a/inner"
    assert got[("/a/other/f2", False)] == "/a"
    assert got[("/a/inner", True)] == "/a/inner"
    # "encryption zone is supported on directory only": a non-directory
    # inode at the zone-root PATH falls through to the outer zone
    assert got[("/a/inner", False)] == "/a"
    assert got[("/free/f3", False)] is None
    assert got[("/a", True)] == "/a"
    keys = {r["path"]: r["key_name"] for r in rows if r["is_dir"] is False}
    assert keys["/a/inner/f1"] == "key-inner"


def test_check_moves_all_actions(spark):
    renames = spark.createDataFrame(
        [
            (1, "/a/inner/f", "/free/f"),     # out of a zone
            (2, "/free/f", "/a/inner/f"),     # into a zone
            (3, "/a/inner/f", "/a/other/f"),  # nested -> outer: CROSS
            (4, "/a/x/f", "/a/y/f"),          # same zone, Completed: OK
            (5, "/re/x/f", "/re/y/f"),        # same zone, Submitted: blocked
            (6, "/free/f", "/free2/f"),       # no zones: OK
            (7, "/a", "/moved_a"),            # zone ROOT moves: parent of
                                              # '/a' is '/', not in a zone,
                                              # and dst parent '/' neither
        ],
        "op_id long, src string, dst string",
    )
    got = {
        r["op_id"]: r["action"]
        for r in enczones.check_moves(renames, _zones(spark)).collect()
    }
    assert got == {
        1: "ERR_FROM_EZ",
        2: "ERR_INTO_EZ",
        3: "ERR_CROSS_EZ",
        4: "OK",
        5: "ERR_REENCRYPTION",
        6: "OK",
        7: "OK",  # getParentEncryptionZoneForPath excludes the inode itself
    }


def test_resolve_plan_is_broadcast_equijoin(spark):
    paths = spark.createDataFrame(
        [(f"/a/u{i % 7}/f{i}", False) for i in range(100)],
        "path string, is_dir boolean",
    )
    plan = (
        enczones.resolve_zones(paths, _zones(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
