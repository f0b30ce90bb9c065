"""Lease-recovery and xattr-store semantics pins (LeaseManager holder
granularity; FSDirXAttrOp last-writer-wins + XAttrPermissionFilter)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hadoop_source_spark.operators import leases as ls
from hadoop_source_spark.operators import xattrs as xa

EPOCH = dt.datetime(2024, 1, 1)


def _d(days):
    return EPOCH + dt.timedelta(days=days)


def test_lease_is_holder_granular(spark):
    # holder A has an old file AND a fresh one: the fresh renewal keeps
    # the WHOLE lease active (Lease.renew is per holder, not per file).
    # holder B's single old file hard-expires; C sits in the soft band.
    files = spark.createDataFrame(
        [
            ("a_old", "A", _d(0)),
            ("a_new", "A", _d(99)),
            ("b_old", "B", _d(0)),
            ("c_mid", "C", _d(97)),
        ],
        "path string, holder string, last_activity_ts timestamp",
    )
    now = int(_d(100).replace(tzinfo=dt.timezone.utc).timestamp())
    probe = spark.createDataFrame([(now,)], "now_s long")
    out = {
        r.path: r
        for r in ls.lease_sweep(
            files, probe, soft_s=2 * 86400.0, hard_s=50 * 86400.0
        ).collect()
    }
    assert out["a_old"].lease_state == "ACTIVE"  # holder-level renewal
    assert out["a_old"].recover_by is None
    assert out["a_old"].holder_open_files == 2
    assert out["b_old"].lease_state == "HARD_EXPIRED"
    assert out["b_old"].recover_by == "NAMENODE"
    assert out["c_mid"].lease_state == "SOFT_EXPIRED"
    assert out["c_mid"].recover_by == "PREEMPTABLE"


def _ops(spark, rows):
    return spark.createDataFrame(
        rows,
        "inode string, ns string, name string, value string, op string, "
        "seq long, is_raw_path boolean",
    )


def test_xattr_last_writer_wins_and_remove(spark):
    rows = [
        ("f1", "user", "k1", "v1", "set", 1, False),
        ("f1", "user", "k1", "v2", "set", 2, False),   # overwrite
        ("f1", "user", "k2", "v3", "set", 3, False),
        ("f1", "user", "k2", None, "remove", 4, False),  # removed
        ("f1", "user", "k3", None, "remove", 5, False),  # remove-then-set
        ("f1", "user", "k3", "v4", "set", 6, False),
    ]
    out = {
        (r.inode, r.name): r
        for r in xa.apply_xattr_ops(_ops(spark, rows)).collect()
    }
    assert set(out) == {("f1", "k1"), ("f1", "k3")}
    assert out[("f1", "k1")].value == "v2"
    assert out[("f1", "k3")].value == "v4"
    assert out[("f1", "k1")].n_xattrs == 2
    assert not out[("f1", "k1")].over_limit


def test_xattr_limit_flag(spark):
    rows = [
        ("big", "user", f"k{i}", "v", "set", i, False) for i in range(40)
    ] + [("ok", "user", "k0", "v", "set", 99, False)]
    out = xa.apply_xattr_ops(_ops(spark, rows), max_per_inode=32)
    got = {r.inode: r.over_limit for r in out.collect()}
    assert got == {"big": True, "ok": False}


def test_xattr_namespace_visibility(spark):
    rows = [
        ("f", "user", "a", "v", "set", 1, False),
        ("f", "trusted", "b", "v", "set", 2, False),
        ("f", "system", "c", "v", "set", 3, False),
        ("f", "security", "d", "v", "set", 4, False),
        ("f", "raw", "e", "v", "set", 5, False),
        ("g", "raw", "e", "v", "set", 6, True),  # via /.reserved/raw
    ]
    out = {
        (r.inode, r.ns): (r.visible_to_user, r.visible_to_superuser)
        for r in xa.visibility_flags(
            xa.apply_xattr_ops(_ops(spark, rows))
        ).collect()
    }
    assert out[("f", "user")] == (True, True)
    assert out[("f", "trusted")] == (False, True)
    assert out[("f", "system")] == (False, False)   # internal only
    assert out[("f", "security")] == (False, False)
    assert out[("f", "raw")] == (False, False)      # not a raw path
    assert out[("g", "raw")] == (False, True)       # raw path + superuser
