"""AM blacklisting pins (Apps.java:274-304,
SimpleBlacklistManager.java:64-85) and standby-checkpoint trigger
pins (StandbyCheckpointer.java:445-480)."""

from __future__ import annotations

from hadoop_source_spark.operators import amblacklist, editlog


def _bl(spark, failures, n_hosts=10, thr=0.3):
    nodes = spark.createDataFrame(
        [(f"n{i}",) for i in range(n_hosts)], "node string"
    )
    out = amblacklist.blacklist_updates(
        spark.createDataFrame(
            failures, "app_id string, node string, exit_status int"
        ),
        nodes,
        disable_threshold=thr,
    ).collect()
    return {(r["app_id"], r["node"]): r for r in out}


def test_exempt_statuses_never_blacklist(spark):
    got = _bl(
        spark,
        [("a", "n1", 0), ("a", "n2", -100), ("a", "n3", -102),
         ("a", "n4", -104), ("a", "n5", -107), ("a", "n6", -101),
         ("a", "n7", 1)],
    )
    assert set(got) == {("a", "n7")}
    assert got[("a", "n7")]["action"] == "BLACKLIST_ADDITION"


def test_invalid_counts_conservatively(spark):
    # INVALID (-1000) counts toward blacklisting per YARN-4284
    got = _bl(spark, [("a", "n1", -1000)])
    assert got[("a", "n1")]["n_failures"] == 1


def test_threshold_flips_to_removal(spark):
    # 10 hosts, threshold 0.3 -> 3 blacklisted nodes disable the list
    under = _bl(spark, [("a", "n1", 1), ("a", "n2", 1)])
    assert all(r["action"] == "BLACKLIST_ADDITION" for r in under.values())
    over = _bl(
        spark, [("a", "n1", 1), ("a", "n2", 1), ("a", "n3", 1)]
    )
    assert all(r["action"] == "BLACKLIST_REMOVAL" for r in over.values())
    assert all(r["disabled"] for r in over.values())


def test_apps_evaluated_independently(spark):
    got = _bl(
        spark,
        [("a", "n1", 1), ("a", "n2", 1), ("a", "n3", 1),
         ("b", "n1", 1)],
    )
    assert got[("a", "n1")]["action"] == "BLACKLIST_REMOVAL"
    assert got[("b", "n1")]["action"] == "BLACKLIST_ADDITION"


def _ck(spark, rows):
    out = editlog.checkpoint_triggers(
        spark.createDataFrame(
            rows,
            "ns long, uncheckpointed long, secs_since_last long,"
            " need_rollback boolean, now long, prevent_until long",
        ),
        txn_count=100,
        period_sec=60,
    ).collect()
    return {r["ns"]: (r["trigger"], r["action"]) for r in out}


def test_checkpoint_trigger_precedence_and_quiet_window(spark):
    got = _ck(
        spark,
        [
            (1, 500, 500, True, 10, 0),    # rollback beats both
            (2, 500, 10, False, 10, 0),    # txn count
            (3, 10, 500, False, 10, 0),    # period
            (4, 10, 10, False, 10, 0),     # nothing
            (5, 500, 10, False, 10, 99),   # triggered but quiet window
            (6, 10, 10, False, 10, 99),    # quiet window, no trigger
        ],
    )
    assert got[1] == ("ROLLBACK", "CHECKPOINT")
    assert got[2] == ("TXN_COUNT", "CHECKPOINT")
    assert got[3] == ("PERIOD", "CHECKPOINT")
    assert got[4] == ("NONE", "NONE")
    assert got[5] == ("TXN_COUNT", "SKIPPED_FAILOVER")
    assert got[6] == ("NONE", "NONE")
