"""NM localization-cache cleaner pins (LocalCacheCleaner.java:35
addResources/cleanCache, LocalResourcesTrackerImpl.remove:382-406,
LocalCacheCleanerStats:101-146)."""

from __future__ import annotations

from hadoop_source_spark.operators import localcache

R_SCHEMA = (
    "node string, rsrc_id long, user string, size long, ts long,"
    " ref_count int, state string"
)
T_SCHEMA = "node string, target_size long"


def _run(spark, rows, targets):
    out = localcache.clean_cache_plan(
        spark.createDataFrame(rows, R_SCHEMA),
        spark.createDataFrame(targets, T_SCHEMA),
    ).collect()
    return {r["rsrc_id"]: r for r in out}


def test_lru_walk_stops_at_target(spark):
    got = _run(
        spark,
        [
            ("n1", 1, None, 60, 10, 0, "LOCALIZED"),
            ("n1", 2, "a", 50, 20, 0, "LOCALIZED"),
            ("n1", 3, "a", 40, 30, 0, "LOCALIZED"),
            ("n1", 4, None, 30, 40, 0, "LOCALIZED"),
            ("n1", 5, "b", 80, 5, 2, "LOCALIZED"),   # in-use, oldest
            ("n1", 6, "b", 10, 50, 0, "LOCALIZED"),
        ],
        [("n1", 100)],
    )
    # in-use counts toward currentSize (270) but is never a candidate
    assert got[5]["action"] == "IN_USE"
    for rid in (1, 2, 3, 4):
        assert got[rid]["action"] == "DELETED"
    # 270 - 180 = 90 <= 100 at rsrc 6's turn
    assert got[6]["action"] == "RETAIN_TARGET_MET"
    r = got[1]
    assert r["cache_size_before_clean"] == 270
    assert r["total_del_size"] == 180
    assert r["public_del_size"] == 90
    assert r["private_del_size"] == 90
    assert got[2]["user_del_size"] == 90       # user a: 50 + 40
    assert got[6]["user_del_size"] == 0        # user b: nothing freed
    assert got[1]["user_del_size"] is None     # public rows: no entry


def test_remove_failure_consumes_no_budget(spark):
    # DOWNLOADING is iterated (remove() returns false) but frees
    # nothing — later candidates still see the full remaining size.
    got = _run(
        spark,
        [
            ("n2", 1, None, 40, 1, 0, "DOWNLOADING"),
            ("n2", 2, None, 30, 2, 0, "LOCALIZED"),
            ("n2", 3, None, 30, 3, 0, "LOCALIZED"),
        ],
        [("n2", 50)],
    )
    assert got[1]["action"] == "REMOVE_FAILED"
    assert got[2]["action"] == "DELETED"
    assert got[3]["action"] == "DELETED"
    assert got[1]["total_del_size"] == 60


def test_absent_counts_in_stats(spark):
    # remove() returns true for an absent resource — its size counts
    # toward the budget and the stats even though nothing is freed.
    got = _run(
        spark,
        [
            ("n3", 1, "x", 25, 1, 0, "ABSENT"),
            ("n3", 2, "x", 30, 2, 0, "LOCALIZED"),
        ],
        [("n3", 40)],
    )
    assert got[1]["action"] == "STATS_ONLY_ABSENT"
    assert got[2]["action"] == "RETAIN_TARGET_MET"
    assert got[1]["total_del_size"] == 25
    assert got[1]["private_del_size"] == 25
    assert got[1]["user_del_size"] == 25


def test_init_removed_without_file_task(spark):
    got = _run(
        spark,
        [("n4", 1, None, 10, 1, 0, "INIT")],
        [("n4", 5)],
    )
    assert got[1]["action"] == "DELETED_NO_FILE"
    assert got[1]["total_del_size"] == 10


def test_strictly_greater_stop_condition(spark):
    # remaining == target stops the walk (currentSize - del > target)
    got = _run(
        spark,
        [
            ("n5", 1, None, 40, 1, 0, "LOCALIZED"),
            ("n5", 2, None, 60, 2, 0, "LOCALIZED"),
        ],
        [("n5", 60)],
    )
    assert got[1]["action"] == "DELETED"
    assert got[2]["action"] == "RETAIN_TARGET_MET"


def test_timestamp_tie_broken_by_rsrc_id(spark):
    got = _run(
        spark,
        [
            ("n6", 9, None, 30, 7, 0, "LOCALIZED"),
            ("n6", 2, None, 30, 7, 0, "LOCALIZED"),
        ],
        [("n6", 40)],
    )
    assert got[2]["action"] == "DELETED"
    assert got[9]["action"] == "RETAIN_TARGET_MET"


def test_nodes_are_independent(spark):
    got = _run(
        spark,
        [
            ("a", 1, None, 100, 1, 0, "LOCALIZED"),
            ("b", 2, None, 100, 1, 0, "LOCALIZED"),
        ],
        [("a", 0), ("b", 1000)],
    )
    assert got[1]["action"] == "DELETED"
    assert got[2]["action"] == "RETAIN_TARGET_MET"


def test_randomized_cross_check_vs_sequential_walk(spark):
    """The monotone-stop prefix-sum closed form vs a literal
    re-implementation of LocalCacheCleaner.cleanCache's loop."""
    import random

    rng = random.Random(20260815)
    rows, targets, expected = [], [], {}
    states = ["LOCALIZED", "LOCALIZED", "LOCALIZED", "INIT",
              "DOWNLOADING", "ABSENT"]
    for n in range(25):
        node = f"n{n}"
        res = []
        for rid in range(rng.randint(1, 20)):
            res.append((
                rng.randint(0, 1000000),             # rsrc uid
                rng.choice([None, "a", "b", "c"]),
                rng.randint(1, 500),                  # size
                rng.randint(0, 5),                    # ts (ties likely)
                rng.choice([0, 0, 0, 2]),             # ref_count
                rng.choice(states),
            ))
        total = sum(r[2] for r in res)
        target = rng.randint(0, max(total, 1))
        targets.append((node, target))
        # sequential walk per the reference
        cand = sorted(
            (r for r in res if r[4] == 0), key=lambda r: (r[3], r[0])
        )
        deleted, acts = 0, {}
        for uid, user, size, ts, ref, state in cand:
            if total - deleted > target:
                if state == "DOWNLOADING":
                    acts[uid] = "REMOVE_FAILED"
                else:
                    deleted += size
                    acts[uid] = {
                        "LOCALIZED": "DELETED",
                        "INIT": "DELETED_NO_FILE",
                        "ABSENT": "STATS_ONLY_ABSENT",
                    }[state]
            else:
                acts[uid] = "RETAIN_TARGET_MET"
        for uid, user, size, ts, ref, state in res:
            expected[(node, uid)] = (
                "IN_USE" if ref > 0 else acts[uid],
                total,
            )
            rows.append((node, uid, user, size, ts, ref, state))
    got = localcache.clean_cache_plan(
        spark.createDataFrame(rows, R_SCHEMA),
        spark.createDataFrame(targets, T_SCHEMA),
    ).collect()
    assert len(got) == len(rows)
    tot_del = {}
    for r in got:
        key = (r["node"], r["rsrc_id"])
        assert (r["action"], r["cache_size_before_clean"]) == \
            expected[key], key
        tot_del[r["node"]] = r["total_del_size"]
    # stats match the sequential deleted sums
    for node, _ in targets:
        want = sum(
            size for (nd, uid), _ in expected.items()
            for (nd2, uid2, user, size, ts, ref, state) in rows
            if nd == node and nd2 == node and uid == uid2
            and expected[(nd, uid)][0] in (
                "DELETED", "DELETED_NO_FILE", "STATS_ONLY_ABSENT")
        )
        assert tot_del[node] == want, node
