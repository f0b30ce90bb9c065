"""NM/RM state-store recovery semantics, pinned per the reference tests
(TestNMLeveldbStateStoreService container status/kill cases,
TestZKRMStateStore app/attempt + fencing cases)."""

from __future__ import annotations

from hadoop_source_spark.operators import statestore as ss


def _nm(spark, rows):
    df = spark.createDataFrame(
        rows, "container_id string, suffix string, value string")
    out = ss.nm_recover_containers(df).collect()
    return {r["container_id"]: r.asDict() for r in out}


def test_nm_status_precedence(spark):
    # exitcode > paused > launched > queued > requested
    got = _nm(spark, [
        ("c1", "/request", None),
        ("c2", "/request", None), ("c2", "/queued", None),
        ("c3", "/request", None), ("c3", "/queued", None),
        ("c3", "/launched", None),
        ("c4", "/request", None), ("c4", "/launched", None),
        ("c4", "/paused", None),
        ("c5", "/request", None), ("c5", "/launched", None),
        ("c5", "/exitcode", "143"), ("c5", "/killed", None),
    ])
    assert got["c1"]["status"] == "REQUESTED"
    assert got["c2"]["status"] == "QUEUED"
    assert got["c3"]["status"] == "LAUNCHED"
    assert got["c4"]["status"] == "PAUSED"
    assert got["c5"]["status"] == "COMPLETED"
    assert got["c5"]["exit_code"] == 143 and got["c5"]["killed"]
    assert not got["c1"]["killed"]


def test_nm_requestless_container_dropped(spark):
    # getNextRecoveredContainer:328-333 — no /request => removed
    got = _nm(spark, [
        ("gone", "/launched", None), ("gone", "/diagnostics", "x"),
        ("kept", "/request", None),
    ])
    assert set(got) == {"kept"}


def test_nm_unknown_key_marks_kill(spark):
    # TestNMLeveldbStateStoreService#testUnexpectedKeyDoesntThrowException
    got = _nm(spark, [
        ("c1", "/request", None), ("c1", "/launched", None),
        ("c1", "/someBogusKey", "v"),
        ("c2", "/request", None),
    ])
    assert got["c1"]["recovery_type"] == "KILL"
    assert got["c1"]["status"] == "LAUNCHED"  # still recovered, then killed
    assert got["c2"]["recovery_type"] == "RECOVER"


def test_nm_values(spark):
    got = _nm(spark, [
        ("c1", "/request", None), ("c1", "/version", "3"),
        ("c1", "/starttime", "1700000123"),
        ("c1", "/remainingRetryAttempts", "2"),
    ])
    r = got["c1"]
    assert (r["version"], r["start_time"], r["remaining_retries"]) == (
        3, 1700000123, 2)
    # defaults when keys absent
    got2 = _nm(spark, [("c9", "/request", None)])
    assert (got2["c9"]["version"], got2["c9"]["remaining_retries"]) == (0, -1)


def _fences(spark):
    return spark.createDataFrame(
        [(0, 1), (100, 2), (200, 3)], "seq long, epoch long")


def test_rm_fencing_drops_stale_writers(spark):
    writes = spark.createDataFrame(
        [
            (10, 1, "z1", "PUT", "a"),     # epoch 1 active at 10 -> applies
            (150, 1, "z1", "PUT", "b"),    # stale epoch at 150 -> dropped
            (160, 2, "z2", "PUT", "c"),    # applies
            (250, 3, "z2", "DELETE", None),  # applies -> z2 gone
            (260, 2, "z3", "PUT", "d"),    # stale -> dropped, z3 never exists
        ],
        "seq long, epoch long, path string, op string, payload string",
    )
    out = {r["path"]: r.asDict()
           for r in ss.rm_apply_fenced_writes(writes, _fences(spark)).collect()}
    assert set(out) == {"z1"}
    assert out["z1"]["payload"] == "a"  # the stale overwrite never landed


def test_rm_last_write_wins_and_delete(spark):
    writes = spark.createDataFrame(
        [
            (10, 1, "z1", "PUT", "v1"),
            (20, 1, "z1", "PUT", "v2"),
            (30, 1, "z2", "PUT", "x"),
            (40, 1, "z2", "DELETE", None),
            (50, 1, "z2", "PUT", "resurrected"),
        ],
        "seq long, epoch long, path string, op string, payload string",
    )
    out = {r["path"]: r["payload"]
           for r in ss.rm_apply_fenced_writes(writes, _fences(spark)).collect()}
    assert out == {"z1": "v2", "z2": "resurrected"}


def test_rm_recover_apps_split_and_attempts(spark):
    # split-index reassembly appIdStr = parent + leaf, name validation,
    # attempt attachment; attempts of deleted apps vanish
    app_writes = spark.createDataFrame(
        [
            # seq epoch si parent leaf op stored state
            (10, 1, 0, "app0001", "", "PUT", "app0001", "RUNNING"),
            (20, 1, 2, "app00", "02", "PUT", "app0002", "FINISHED"),
            (30, 1, 0, "app0003", "", "PUT", "Xapp0003", "NEW"),  # bad name
            (40, 1, 0, "app0004", "", "PUT", "app0004", "NEW"),
            (50, 1, 0, "app0004", "", "DELETE", None, None),
        ],
        "seq long, epoch long, split_index int, parent string, leaf string,"
        " op string, stored_app_id string, state string",
    )
    attempt_writes = spark.createDataFrame(
        [
            (60, 1, "0/app0001/", 1, "PUT", "FAILED"),
            (70, 1, "0/app0001/", 2, "PUT", "SUCCEEDED"),
            (80, 1, "2/app00/02", 1, "PUT", "FAILED"),
            (90, 1, "0/app0004/", 1, "PUT", "FAILED"),  # app deleted
        ],
        "seq long, epoch long, app_path string, attempt_id int, op string,"
        " final_status string",
    )
    out = {r["app_id"]: r.asDict() for r in ss.rm_recover_apps(
        app_writes, attempt_writes, _fences(spark)).collect()}
    assert set(out) == {"app0001", "app0002", "app0003"}
    assert out["app0002"]["split_index"] == 2
    assert out["app0001"]["n_attempts"] == 2
    assert out["app0001"]["n_failed_attempts"] == 1
    assert out["app0001"]["max_attempt_id"] == 2
    assert out["app0002"]["n_attempts"] == 1
    assert out["app0003"]["name_ok"] is False
    assert out["app0001"]["name_ok"] is True
    assert out["app0003"]["n_attempts"] == 0
    assert out["app0003"]["max_attempt_id"] == -1
