"""FairScheduler queue-placement rule-chain pins (QueuePlacementPolicy
+ placement/*.java semantics)."""

from __future__ import annotations

import pytest

from hadoop_source_spark.operators import fairplacement as fp


def _apps(spark, rows):
    return spark.createDataFrame(
        rows,
        "app_id long, user string, primary_group string, "
        "secondary_groups array<string>, specified_queue string",
    )


RULES = [
    {"name": "specified"},
    {"name": "user", "create": False},
    {"name": "secondaryGroupExistingQueue"},
    {"name": "primaryGroup", "create": False},
    {"name": "default", "queue": "root.backfill", "create": True},
]
EXISTING = ["root.eng", "root.u3", "root.g1", "root.s9", "root.default"]


def test_rule_order_and_fallthrough(spark):
    rows = [
        # specified queue exists → wins over everything
        (1, "u3", "g1", ["s9"], "eng"),
        # specified missing → falls to user (root.u3 exists)
        (2, "u3", "g1", ["s9"], "adhoc"),
        # the literal 'default' is skipped by the specified rule
        # (SpecifiedPlacementRule.java:55) → user rule
        (3, "u3", "g0", [], "default"),
        # no user queue → FIRST existing secondary group
        (4, "u7", "g0", ["s0", "s9"], None),
        # no secondary match → primaryGroup (exists)
        (5, "u7", "g1", ["s0"], None),
        # nothing matches → created fallback
        (6, "u7", "g0", ["s0"], None),
    ]
    out = {r.app_id: r for r in
           fp.place_apps(_apps(spark, rows), RULES, EXISTING).collect()}
    assert (out[1].assigned_queue, out[1].matched_rule) == (
        "root.eng", "specified")
    assert (out[2].assigned_queue, out[2].matched_rule) == (
        "root.u3", "user")
    assert out[3].matched_rule == "user"
    assert (out[4].assigned_queue, out[4].matched_rule) == (
        "root.s9", "secondaryGroupExistingQueue")
    assert (out[5].assigned_queue, out[5].matched_rule) == (
        "root.g1", "primaryGroup")
    assert (out[6].assigned_queue, out[6].matched_rule, out[6].created) == (
        "root.backfill", "default", True)
    assert not out[1].created


def test_dotted_names_cleaned(spark):
    # cleanName (FairQueuePlacementUtils.java:53): '.' → '_dot_' so a
    # dotted user cannot splice itself deeper into the queue tree
    rows = [(1, "evil.user", "g0", [], None)]
    rules = [{"name": "user", "create": True}]
    r = fp.place_apps(_apps(spark, rows), rules, EXISTING).collect()[0]
    assert r.assigned_queue == "root.evil_dot_user"
    assert r.created


def test_reject_rule_terminal(spark):
    rows = [(1, "u1", "g0", [], None)]
    rules = [{"name": "user", "create": False}, {"name": "reject"}]
    r = fp.place_apps(_apps(spark, rows), rules, EXISTING).collect()[0]
    assert r.assigned_queue is None and r.matched_rule == "reject"
    assert not r.created


def test_config_validation_mirrors_updateRuleSet(spark):
    apps = _apps(spark, [(1, "u", "g", [], None)])
    # terminal rule before the last → unreachable rules (:100-110)
    with pytest.raises(ValueError, match="can never be reached"):
        fp.place_apps(
            apps,
            [{"name": "user", "create": True}, {"name": "default"}],
            EXISTING,
        )
    # non-terminal final rule (:111-115)
    with pytest.raises(ValueError, match="past last queue placement"):
        fp.place_apps(
            apps,
            [{"name": "specified"}],
            EXISTING,
        )


def test_placement_is_pure_codegen(spark):
    rows = [(1, "u3", "g1", ["s9"], "eng")]
    df = fp.place_apps(_apps(spark, rows), RULES, EXISTING)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Join" not in plan
