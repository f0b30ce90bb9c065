"""Edit-log replay (operators/editlog): chain resolution, truncate fold,
derivation scoping — the replay invariants FSEditLogLoader guarantees by
sequential txid order, here checked against hand-computed images."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hadoop_source_spark.operators import editlog as el


def _ts(i: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "op string, path string, path2 string, delta double, ts timestamp, eid long"
    )


def test_long_rename_chain_resolves_in_log_rounds(spark):
    # depth-40 chain: pointer doubling must resolve it well inside
    # max_iter=30 (ceil(log2 40) = 6 doubling rounds), and every node
    # must report the root inode with its exact depth.
    rows = [("OP_ADD", "n0", None, None, _ts(0), 0)]
    rows += [
        ("OP_RENAME", f"n{i}", f"n{i + 1}", None, _ts(i + 1), i + 1)
        for i in range(40)
    ]
    out = el.resolve_rename_chains(_log(spark, rows)).collect()
    assert len(out) == 41
    assert all(r.inode == "n0" for r in out)
    depths = {r.node: r.depth for r in out}
    assert depths["n0"] == 0 and depths["n40"] == 40 and depths["n17"] == 17


def test_truncate_resets_appends(spark):
    # appends 10+20, truncate, append 5 → live_size 5; counts keep all.
    rows = [
        ("OP_ADD", "a", None, None, _ts(0), 0),
        ("OP_APPEND", "a", None, 10.0, _ts(1), 1),
        ("OP_APPEND", "a", None, 20.0, _ts(2), 2),
        ("OP_TRUNCATE", "a", None, None, _ts(3), 3),
        ("OP_APPEND", "a", None, 5.0, _ts(4), 4),
        ("OP_TIMES", "a", None, None, _ts(5), 5),
    ]
    img = el.replay(_log(spark, rows)).collect()
    assert len(img) == 1
    r = img[0]
    assert (r.live_size, r.n_appends, r.n_truncates, r.n_renames) == (5.0, 3, 1, 0)
    assert r.mtime_ts == _ts(5)  # OP_TIMES touches mtime


def test_ops_follow_renames(spark):
    # append lands on the renamed path; both ops fold into one inode.
    rows = [
        ("OP_ADD", "a", None, None, _ts(0), 0),
        ("OP_APPEND", "a", None, 7.0, _ts(1), 1),
        ("OP_RENAME", "a", "b", None, _ts(2), 2),
        ("OP_APPEND", "b", None, 3.0, _ts(3), 3),
    ]
    img = el.replay(_log(spark, rows)).collect()
    assert len(img) == 1
    r = img[0]
    assert (r.inode, r.final_path, r.live_size, r.n_renames) == ("a", "b", 10.0, 1)


def test_derivation_drops_pre_create_ops_and_later_signups(spark):
    # ops before the first signup never reach the log; a second signup
    # is a no-op re-create (first-create-wins), not a second OP_ADD.
    ev = spark.createDataFrame(
        [
            (1, _ts(0), 100, "purchase", 9.0, ""),   # pre-create: dropped
            (2, _ts(1), 100, "signup", 0.0, ""),     # create
            (3, _ts(2), 100, "purchase", 4.0, ""),
            (4, _ts(3), 100, "signup", 0.0, ""),     # later signup: dropped
            (5, _ts(4), 100, "view", 0.0, ""),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    log = el.derive_edit_log(ev)
    ops = {r.op: r for r in log.collect()}
    assert set(ops) == {"OP_ADD", "OP_APPEND", "OP_RENAME"}
    assert ops["OP_ADD"].path == "f0_100" and ops["OP_ADD"].eid == 2
    assert ops["OP_APPEND"].path == "f0_100" and ops["OP_APPEND"].delta == 4.0
    assert (ops["OP_RENAME"].path, ops["OP_RENAME"].path2) == ("f0_100", "f5")


def test_replay_matches_sequential_reference(spark, sf_dir):
    # end-to-end pin on real data: distributed replay == a literal
    # op-by-op Python fold of the same derived log (the reference's
    # loadEditRecords strategy), per inode.
    log_rows = el.derive_edit_log(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).collect()
    owner, size, mtime = {}, {}, {}
    renames, appends, truncs = {}, {}, {}
    for r in sorted(log_rows, key=lambda r: (r.ts, r.eid)):
        if r.op == "OP_ADD":
            owner[r.path] = r.path
            size[r.path] = 0.0
            mtime[r.path] = r.ts
            for d in (renames, appends, truncs):
                d[r.path] = 0
            continue
        ino = owner[r.path]
        if r.op == "OP_RENAME":
            owner[r.path2] = ino
            renames[ino] += 1
        elif r.op == "OP_APPEND":
            size[ino] += r.delta
            appends[ino] += 1
        elif r.op == "OP_TRUNCATE":
            size[ino] = 0.0
            truncs[ino] += 1
        mtime[ino] = max(mtime[ino], r.ts)
    got = {
        r.inode: r
        for r in el.replay(
            el.derive_edit_log(spark.read.parquet(f"{sf_dir}/events.parquet"))
        ).collect()
    }
    assert set(got) == set(owner.values()) == set(size)
    for ino, r in got.items():
        assert abs(r.live_size - round(size[ino], 2)) < 1e-6, ino
        assert r.n_renames == renames[ino], ino
        assert r.n_appends == appends[ino], ino
        assert r.n_truncates == truncs[ino], ino
        assert r.mtime_ts == mtime[ino], ino


def test_unrooted_or_cyclic_chains_raise(spark):
    """ADVICE pin: a rename cycle (no chain ever reaches an OP_ADD root)
    must fail loudly after max_iter doubling rounds, not emit rows whose
    inode is a mid-chain name."""
    import pytest

    rows = [
        ("OP_RENAME", "a", "b", None, _ts(0), 0),
        ("OP_RENAME", "b", "c", None, _ts(1), 1),
        ("OP_RENAME", "c", "a", None, _ts(2), 2),
    ]
    with pytest.raises(ValueError, match="unresolved"):
        el.resolve_rename_chains(_log(spark, rows), max_iter=5)


def test_phantom_terminal_raises(spark):
    """A chain that resolves but ends at a name never OP_ADDed must not
    present the phantom terminal as a root inode."""
    import pytest

    rows = [
        ("OP_ADD", "real", None, 1.0, _ts(0), 0),
        ("OP_RENAME", "ghost", "x", None, _ts(1), 1),
        ("OP_RENAME", "x", "y", None, _ts(2), 2),
    ]
    with pytest.raises(ValueError, match="never OP_ADDed"):
        el.resolve_rename_chains(_log(spark, rows))
