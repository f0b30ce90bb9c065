"""Rename quota verification pins (FSDirRenameOp.java:70-93,
FSDirectory.java:1202-1228, DirectoryWithQuotaFeature.java:185-224,
Quota.java:61-64)."""

from __future__ import annotations

from hadoop_source_spark.operators import renamequota


def _quota(spark, rows):
    return spark.createDataFrame(
        rows,
        "dir_path string, ns_quota long, ss_quota long,"
        " ns_used long, ss_used long",
    )


def _snap(spark, paths=()):
    return spark.createDataFrame(
        [(p,) for p in paths] or [("/nope",)], "dir_path string"
    )


def _run(spark, renames, quota, snap=()):
    df = spark.createDataFrame(
        renames, "op_id long, src string, dst string,"
        " delta_ns long, delta_ss long"
    )
    rows = renamequota.precheck(
        df, _quota(spark, quota), _snap(spark, snap)
    ).collect()
    return {r["op_id"]: (r["verdict"], r["violating_dir"]) for r in rows}


def test_ns_checked_before_ss(spark):
    # DirectoryWithQuotaFeature.verifyQuota: namespace first — a dir
    # where BOTH are exhausted reports NS_QUOTA
    got = _run(
        spark,
        [(1, "/a/x/f", "/a/y/f", 1, 100)],
        [("/a/y", 10, 1000, 10, 1000)],
    )
    assert got[1] == ("NS_QUOTA", "/a/y")


def test_nonpositive_delta_never_violates(spark):
    # Quota.isViolated requires delta > 0; freeing quota (rename that
    # overwrites a bigger dst) passes even at an exhausted quota
    got = _run(
        spark,
        [(1, "/a/x/f", "/a/y/f", 0, -5), (2, "/a/x/g", "/a/y/g", 0, 0)],
        [("/a/y", 1, 1, 1, 1)],
    )
    assert got[1] == ("OK", None)
    assert got[2] == ("OK", None)


def test_walk_stops_at_common_ancestor(spark):
    # /a is the last common ancestor of /a/x/f -> /a/y/f: its exhausted
    # quota (and anything above) is NOT checked — the subtree leaves
    # and arrives under the same directory
    got = _run(
        spark,
        [(1, "/a/x/f", "/a/y/f", 1, 512)],
        [("/a", 1, -1, 1, 0), ("/", 1, -1, 1, 0)],
    )
    assert got[1] == ("OK", None)


def test_snapshot_ancestor_keeps_walk_alive(spark):
    # FSDirectory.verifyQuota: the stop is skipped when the common
    # ancestor is in the latest snapshot (it retains the source copy);
    # the walk then checks the ancestor ITSELF and everything above
    got = _run(
        spark,
        [(1, "/a/x/f", "/a/y/f", 1, 512),
         (2, "/b/x/f", "/b/y/f", 1, 512)],
        [("/a", 1, -1, 1, 0), ("/b", 1, -1, 1, 0)],
        snap=["/a"],
    )
    assert got[1] == ("NS_QUOTA", "/a")   # snapshot: CA checked
    assert got[2] == ("OK", None)         # no snapshot: stop applies


def test_deepest_violation_reported(spark):
    # the reference walks deepest-first and throws at the FIRST
    # violation — with two violating dirs on the path, the deeper wins
    got = _run(
        spark,
        [(1, "/r/a/b/f", "/r/a/c/g", 1, 512)],
        [("/r/a/c", 5, -1, 5, 0), ("/r/a", 5, -1, 5, 0)],
        snap=["/r/a"],
    )
    assert got[1] == ("NS_QUOTA", "/r/a/c")


def test_inplace_rename_empty_walk(spark):
    # dst parent IS the common ancestor: the walk range is empty and
    # even an exhausted quota on the parent itself is not checked
    got = _run(
        spark,
        [(1, "/a/x/f", "/a/x/g", 1, 512)],
        [("/a/x", 1, 1, 1, 1)],
    )
    assert got[1] == ("OK", None)


def test_unset_quota_is_minus_one(spark):
    # quota of -1 never violates regardless of usage or delta
    got = _run(
        spark,
        [(1, "/a/x/f", "/a/y/f", 1, 1 << 40)],
        [("/a/y", -1, -1, 10**9, 10**15)],
    )
    assert got[1] == ("OK", None)


def test_ss_violation_magnitude(spark):
    # storagespace: usage > quota - delta is the exact boundary
    got = _run(
        spark,
        [(1, "/a/x/f", "/a/y/f", 0, 100),   # 900 > 1000-100? no -> OK
         (2, "/a/x/g", "/a/y/g", 0, 101)],  # 900 > 1000-101 -> SS
        [("/a/y", -1, 1000, 0, 900)],
    )
    assert got[1] == ("OK", None)
    assert got[2] == ("SS_QUOTA", "/a/y")
