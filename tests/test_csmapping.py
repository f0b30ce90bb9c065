"""CS queue-mapping pins (UserGroupMappingPlacementRule.java:100-201
getPlacementForUser, getSecondaryGroup:80-98,
getContextForGroupParent:226-251)."""

from __future__ import annotations

from hadoop_source_spark.operators import csmapping
from hadoop_source_spark.operators.csmapping import QueueMapping as M

QUEUES = ["eng", "ops", "grpA", "secB"]


def _run(spark, users, mappings, queues=QUEUES):
    out = csmapping.map_queue_placements(
        spark.createDataFrame(users, "user string, groups array<string>"),
        mappings,
        queues,
    ).collect()
    return {r["user"]: r for r in out}


def test_first_match_wins_and_rule_kinds(spark):
    got = _run(
        spark,
        [
            ("alice", ["grpA", "secB"]),   # exact rule 1
            ("bob", ["grpA", "x"]),        # group rule 0 (grpA member)
            ("carol", ["other", "secB"]),  # group rule 2 -> %user
            ("dave", ["other", "x"]),      # nothing matches
        ],
        [
            M("u", "alice", "%primary_group"),
            M("g", "grpA", "ops"),
            M("g", "secB", "%user"),
            M("u", "dave2", "eng"),
        ],
    )
    a = got["alice"]
    assert (a["matched_rule"], a["queue"], a["action"]) == (
        0, "grpA", "PLACED")
    assert (got["bob"]["matched_rule"], got["bob"]["queue"]) == (1, "ops")
    assert (got["carol"]["matched_rule"], got["carol"]["queue"]) == (
        2, "carol")
    d = got["dave"]
    assert d["action"] == "DEFAULT_QUEUE" and d["matched_rule"] is None


def test_secondary_group_existence_filter(spark):
    # secondary = first group AFTER the primary that exists as a queue
    got = _run(
        spark,
        [
            ("u1", ["g0", "nope", "secB", "eng"]),  # -> secB (first hit)
            ("u2", ["g0", "nope", "xx"]),           # no eligible secondary
        ],
        [M("u", "%user", "%secondary_group")],
    )
    assert got["u1"]["queue"] == "secB"
    # matched rule is TERMINAL even when it cannot resolve
    u2 = got["u2"]
    assert u2["action"] == "NO_PLACEMENT" and u2["matched_rule"] == 0


def test_parent_group_queue_must_exist(spark):
    got = _run(
        spark,
        [
            ("p1", ["grpA"]),    # primary queue exists -> parent=grpA
            ("p2", ["nope"]),    # primary not a queue -> null placement
        ],
        [M("u", "%user", "%user", parent="%primary_group")],
    )
    p1 = got["p1"]
    assert (p1["queue"], p1["parent_queue"], p1["action"]) == (
        "p1", "grpA", "PLACED")
    assert got["p2"]["action"] == "NO_PLACEMENT"


def test_exact_user_secondary_null_is_terminal(spark):
    # u:<name>:%secondary_group with no secondary returns null and
    # does NOT fall through to the later catch-all
    got = _run(
        spark,
        [("eve", ["g0", "xx"])],
        [
            M("u", "eve", "%secondary_group"),
            M("u", "%user", "eng"),
        ],
    )
    assert got["eve"]["action"] == "NO_PLACEMENT"
    assert got["eve"]["matched_rule"] == 0


def test_exact_user_rule_takes_user_placeholder_literally(spark):
    # the exact-source branch (:150-180) only resolves %primary_group
    # and %secondary_group — '%user' in the queue position is NOT
    # substituted and lands as a literal queue name (reference quirk)
    got = _run(
        spark,
        [("u21", ["g0"])],
        [csmapping.QueueMapping("u", "u21", "%user")],
    )
    assert got["u21"]["queue"] == "%user"
    assert got["u21"]["action"] == "PLACED"
