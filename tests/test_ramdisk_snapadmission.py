"""LAZY_PERSIST eviction pins (RamDiskReplicaLruTracker.java:66-200,
FsDatasetImpl.java:3226-3276) and snapshot-admission pins
(SnapshotManager.java:316-345,
DirectorySnapshottableFeature.java:181-205)."""

from __future__ import annotations

from hadoop_source_spark.operators import ramdisk, snapadmission

R_SCHEMA = (
    "node string, block_id long, persisted boolean, deleted boolean,"
    " last_used_time long, num_reads long, size_bytes long"
)
N_SCHEMA = "node string, cache_capacity long, cache_used long"


def _evict(spark, replicas, nodes, needed, cap=3):
    out = ramdisk.eviction_plan(
        spark.createDataFrame(replicas, R_SCHEMA),
        spark.createDataFrame(nodes, N_SCHEMA),
        bytes_needed=needed,
        max_evictions=cap,
    ).collect()
    return {r["block_id"]: r for r in out}


def test_only_persisted_lru_order_and_stop(spark):
    # free = 10; need 25; LRU order is last_used_time then block id;
    # unpersisted replicas are never candidates
    got = _evict(
        spark,
        [
            ("n", 1, True, False, 50, 1, 10),   # newest: never reached
            ("n", 2, True, False, 10, 0, 10),   # LRU first
            ("n", 3, True, False, 20, 2, 10),   # second: free 20 -> evict
            ("n", 4, False, False, 5, 0, 99),   # oldest but unpersisted
        ],
        [("n", 100, 90)],
        needed=25,
    )
    assert got[2]["status"] == "EVICT" and got[2]["lru_rank"] == 1
    assert got[3]["status"] == "EVICT" and got[3]["lru_rank"] == 2
    # after evicting 2 and 3: free = 10+20 = 30 >= 25 -> stop
    assert got[1]["status"] == "RETAIN" and got[1]["lru_rank"] == 3
    assert got[4]["status"] == "PENDING_PERSIST"
    assert got[2]["evicted_without_read"] is True
    assert got[3]["evicted_without_read"] is False


def test_iteration_cap_binds(spark):
    replicas = [("n", i, True, False, i, 1, 1) for i in range(1, 6)]
    got = _evict(spark, replicas, [("n", 100, 100)], needed=1000, cap=3)
    assert [got[i]["status"] for i in range(1, 6)] == [
        "EVICT", "EVICT", "EVICT", "RETAIN", "RETAIN",
    ]


def test_stale_entries_do_not_consume_rank(spark):
    got = _evict(
        spark,
        [
            ("n", 1, True, True, 1, 0, 10),   # deleted: GC'd, skipped
            ("n", 2, True, False, 2, 0, 10),
        ],
        [("n", 100, 95)],
        needed=10,
    )
    assert got[1]["status"] == "STALE" and got[1]["lru_rank"] is None
    assert got[2]["status"] == "EVICT" and got[2]["lru_rank"] == 1


def test_no_eviction_when_free_enough(spark):
    got = _evict(
        spark,
        [("n", 1, True, False, 1, 0, 10)],
        [("n", 100, 10)],
        needed=50,
    )
    assert got[1]["status"] == "RETAIN"


D_SCHEMA = (
    "ns string, dir_path string, snapshottable boolean, existing_n int,"
    " quota int, max_limit int, existing_names array<string>"
)


def _admit(spark, requests, dirs, namespaces=None):
    return {
        r["req_id"]: r["verdict"]
        for r in snapadmission.admit(
            spark.createDataFrame(
                requests, "req_id long, ns string, dir_path string,"
                " name string, t long"
            ),
            spark.createDataFrame(dirs, D_SCHEMA),
            spark.createDataFrame(
                namespaces or [("ns", False)],
                "ns string, ids_exhausted boolean",
            ),
        ).collect()
    }


def test_check_order_and_admission(spark):
    dirs = [("ns", "/d", True, 0, 2, 65536, ["old"])]
    got = _admit(
        spark,
        [
            (1, "ns", "/d", "a", 1),     # OK (n=0)
            (2, "ns", "/d", "old", 2),   # dup of existing -> NAME
            (3, "ns", "/d", "a", 3),     # in-batch dup -> NAME
            (4, "ns", "/d", "b", 4),     # OK (n=1 -> 2 = quota)
            (5, "ns", "/d", "c", 5),     # quota full -> QUOTA
            (6, "ns", "/d", "a", 6),     # dup AND quota full: QUOTA first
        ],
        dirs,
    )
    assert got == {
        1: "OK", 2: "NAME_EXISTS", 3: "NAME_EXISTS", 4: "OK",
        5: "QUOTA_EXCEEDED", 6: "QUOTA_EXCEEDED",
    }


def test_rejections_do_not_consume_count(spark):
    # two NAME rejections before the last fresh request: n stays 0,
    # so the fresh one is still admitted under quota 1
    dirs = [("ns", "/d", True, 0, 1, 65536, ["x"])]
    got = _admit(
        spark,
        [(1, "ns", "/d", "x", 1), (2, "ns", "/d", "x", 2),
         (3, "ns", "/d", "y", 3)],
        dirs,
    )
    assert got == {1: "NAME_EXISTS", 2: "NAME_EXISTS", 3: "OK"}


def test_limit_after_quota_and_not_snapshottable_first(spark):
    dirs = [
        ("ns", "/lim", True, 0, 64, 1, []),
        ("ns", "/no", False, 0, 64, 65536, []),
    ]
    got = _admit(
        spark,
        [
            (1, "ns", "/lim", "a", 1),   # OK
            (2, "ns", "/lim", "b", 2),   # limit 1 -> LIMIT
            (3, "ns", "/no", "a", 3),    # NOT_SNAPSHOTTABLE
            (4, "ns", "/missing", "a", 4),  # unknown dir
        ],
        dirs,
    )
    assert got == {
        1: "OK", 2: "LIMIT_EXCEEDED", 3: "NOT_SNAPSHOTTABLE",
        4: "NOT_SNAPSHOTTABLE",
    }


def test_out_of_ids_fails_everything_before_per_dir_checks(spark):
    dirs = [("ns", "/d", True, 0, 64, 65536, ["x"])]
    got = _admit(
        spark,
        [(1, "ns", "/d", "a", 1), (2, "ns", "/d", "x", 2)],
        dirs,
        namespaces=[("ns", True)],
    )
    assert got == {1: "OUT_OF_IDS", 2: "OUT_OF_IDS"}
