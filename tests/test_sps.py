"""SPS pins (StoragePolicySatisfier.java: source passes :510-567,
checkSourceAndTargetTypeExists :881-902 existence-not-space, partial
target map :837-864, local pass :598-623 in pending order, remote
tiers :629-677 with exclude growth, overlap removal :1182-1196
either-side-empty, the :514/:561 always-paired latch)."""

from __future__ import annotations

from hadoop_source_spark.operators import sps

FILES_SCHEMA = (
    "file_id long, policy string, replication int,"
    " under_construction boolean, is_striped boolean, ec_data int,"
    " ec_parity int"
)
BLOCKS_SCHEMA = "block_id long, file_id long"
REP_SCHEMA = "block_id long, slot int, node_id string, storage_type string"
STOR_SCHEMA = "node_id string, storage_type string, avail_bytes long"
NODES_SCHEMA = "node_id string, rack string"


def _file(fid=0, policy="HOT", repl=3, uc=False, striped=False):
    return (fid, policy, repl, uc, striped, 2, 1)


def _moves(spark, files, blocks, replicas, storages, nodes):
    out = sps.move_plan(
        spark.createDataFrame(files, FILES_SCHEMA),
        spark.createDataFrame(blocks, BLOCKS_SCHEMA),
        spark.createDataFrame(replicas, REP_SCHEMA),
        spark.createDataFrame(storages, STOR_SCHEMA),
        spark.createDataFrame(nodes, NODES_SCHEMA),
    ).collect()
    return {r["source_node"]: r for r in out}


def _status(spark, files, blocks, replicas):
    out = sps.file_status(
        spark.createDataFrame(files, FILES_SCHEMA),
        spark.createDataFrame(blocks, BLOCKS_SCHEMA),
        spark.createDataFrame(replicas, REP_SCHEMA),
    ).collect()
    return {r["file_id"]: r["status"] for r in out}


def test_multi_source_pending_consumption_and_exclude_growth(spark):
    # COLD file: expected [A,A,A]; replicas all DISK -> 3 sources.
    # ARCHIVE space only on remote nodes t1 < t2; the first source
    # takes min(t1), which is then EXCLUDED, so the second source
    # must take t2 and the third finds nothing (UNPAIRED).
    nodes = [("s1", "r1"), ("s2", "r2"), ("s3", "r3"),
             ("t1", "r4"), ("t2", "r5")]
    storages = (
        [(n, "DISK", 10) for n, _ in nodes]
        + [(n, "ARCHIVE", 0) for n in ("s1", "s2", "s3")]
        + [("t1", "ARCHIVE", 10), ("t2", "ARCHIVE", 10)]
    )
    got = _moves(
        spark,
        [_file(policy="COLD")],
        [(0, 0)],
        [(0, 0, "s1", "DISK"), (0, 1, "s2", "DISK"),
         (0, 2, "s3", "DISK")],
        storages, nodes,
    )
    assert got["s1"]["action"] == "REMOTE_ANY"
    assert got["s1"]["target_node"] == "t1"
    assert got["s2"]["action"] == "REMOTE_ANY"
    assert got["s2"]["target_node"] == "t2"
    assert got["s3"]["action"] == "UNPAIRED"
    assert got["s3"]["target_type"] is None


def test_partial_target_map_abort_blocks_later_types(spark):
    # ONE_SSD: expected leftover [SSD, DISK]; NO node in the cluster
    # HAS an SSD storage at all, so findTargetsForExpectedStorageTypes
    # aborts before adding DISK -> even an available DISK target is
    # invisible and the source goes UNPAIRED (:845-847).
    nodes = [("s1", "r1"), ("s2", "r1"), ("t1", "r2")]
    storages = [
        ("s1", "ARCHIVE", 10), ("s1", "DISK", 10),
        ("s2", "DISK", 10), ("t1", "DISK", 10),
    ]
    got = _moves(
        spark,
        [_file(policy="ONE_SSD", repl=2)],
        [(0, 0)],
        [(0, 0, "s1", "ARCHIVE"), (0, 1, "s2", "ARCHIVE")],
        storages, nodes,
    )
    # expected [SSD, DISK] vs existing [A, A]: two sources, both fail.
    assert got["s1"]["action"] == "UNPAIRED"
    assert got["s2"]["action"] == "UNPAIRED"


def test_local_pass_walks_pending_in_order(spark):
    # ONE_SSD repl 2: pending [SSD, DISK] after one ARCHIVE replica
    # matched nothing... source node lacks SSD space but has DISK
    # space -> LOCAL with DISK (second pending type), exactly
    # chooseTargetTypeInSameNode's in-order walk.
    nodes = [("s1", "r1"), ("s2", "r2"), ("x", "r3")]
    storages = [
        ("s1", "ARCHIVE", 10), ("s1", "DISK", 10), ("s1", "SSD", 0),
        ("s2", "DISK", 10), ("x", "SSD", 10), ("x", "DISK", 10),
    ]
    got = _moves(
        spark,
        [_file(policy="ONE_SSD", repl=2)],
        [(0, 0)],
        [(0, 0, "s1", "ARCHIVE"), (0, 1, "s2", "DISK")],
        storages, nodes,
    )
    # existing [A, D], expected [S, D] -> leftover exp [S], exist [A]:
    # single pending SSD; s1 has no SSD space; x (r3) has -> REMOTE_ANY.
    assert got["s1"]["action"] == "REMOTE_ANY"
    assert got["s1"]["target_type"] == "SSD"
    assert got["s1"]["target_node"] == "x"
    assert len(got) == 1  # matched DISK replica is never a source


def test_same_rack_beats_any_other(spark):
    nodes = [("s1", "r1"), ("rackmate", "r1"), ("far", "r9"),
             ("s2", "r2"), ("s3", "r3")]
    storages = (
        [(n, "DISK", 10) for n, _ in nodes]
        + [("s1", "ARCHIVE", 0), ("rackmate", "ARCHIVE", 10),
           ("far", "ARCHIVE", 10)]
    )
    got = _moves(
        spark,
        [_file(policy="WARM")],
        [(0, 0)],
        [(0, 0, "s1", "DISK"), (0, 1, "s2", "DISK"),
         (0, 2, "s3", "ARCHIVE")],
        storages, nodes,
    )
    # expected [D,A,A] vs existing [D,D,A] -> pending [A], source s2?
    # Phase A walks locations in order: s1 HAS types in both leftover
    # sets (DISK existing-leftover; ARCHIVE expected-leftover storage
    # present even with 0 space - existence, not space, :881-902) ->
    # s1 is the source, not s2.
    assert list(got) == ["s1"]
    assert got["s1"]["action"] == "REMOTE_SAME_RACK"
    assert got["s1"]["target_node"] == "rackmate"


def test_source_with_expected_type_skips_local_but_not_remote(spark):
    # Source already sits on an expected type -> local pass skips it
    # (:606 gate) but the remote pass may still move it.
    nodes = [("s1", "r1"), ("t1", "r2")]
    storages = [
        ("s1", "DISK", 10), ("s1", "ARCHIVE", 10),
        ("t1", "ARCHIVE", 10), ("t1", "DISK", 10),
    ]
    # HOT repl 1: expected [D]; existing [A] -> pending [D], source A.
    got = _moves(
        spark, [_file(policy="HOT", repl=1)], [(0, 0)],
        [(0, 0, "s1", "ARCHIVE")], storages, nodes,
    )
    # ARCHIVE not in pending -> local eligible: s1 has DISK space ->
    # LOCAL (sanity check of the inverse gate).
    assert got["s1"]["action"] == "LOCAL"
    assert got["s1"]["target_type"] == "DISK"


def test_status_warm_under_replicated_reads_satisfied(spark):
    # WARM repl 3 with replicas [D, A]: overlap empties the EXISTING
    # side -> satisfied (:1195 either-side-empty), low redundancy ->
    # FEW_LOW_REDUNDANCY_BLOCKS, not PAIRED.
    st = _status(
        spark, [_file(policy="WARM")], [(0, 0)],
        [(0, 0, "a", "DISK"), (0, 1, "b", "ARCHIVE")],
    )
    assert st[0] == sps.FEW_LOW_REDUNDANCY


def test_status_paired_latch_even_when_unpaired(spark):
    # Mismatch with NO possible target still reports PAIRED — the
    # reference's :514 initialization plus :561 |= never turns the
    # flag false; the engine reproduces the latch.
    files = [_file(policy="COLD", repl=1)]
    st = _status(spark, files, [(0, 0)], [(0, 0, "a", "DISK")])
    assert st[0] == sps.TARGETS_PAIRED


def test_status_gate_order(spark):
    files = [
        _file(0, uc=True),                       # UC beats everything
        _file(1),                                # no blocks
        _file(2, policy="WARM", striped=True),   # EC-unsuitable
        _file(3, policy="HOT"),                  # satisfied
    ]
    blocks = [(20, 2), (30, 3)]
    reps = [(20, 0, "a", "ARCHIVE"),
            (30, 0, "a", "DISK"), (30, 1, "b", "DISK"),
            (30, 2, "c", "DISK")]
    st = _status(spark, files, blocks, reps)
    assert st[0] == sps.SKIPPED_RETRY
    assert st[1] == sps.PAIRING_SKIPPED
    assert st[2] == sps.PAIRING_SKIPPED
    assert st[3] == sps.ALREADY_SATISFIED
