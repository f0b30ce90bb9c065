"""KMS key ACL lattice pins (KMSACLs.java:277-308,
KeyAuthorizationKeyProvider.java:139-152, AccessControlList.java:230)."""

from __future__ import annotations

from hadoop_source_spark.operators import kmsacl

ACL_SCHEMA = (
    "key string, op string, users array<string>, groups array<string>, "
    "all_allowed boolean"
)
OP_SCHEMA = (
    "op string, users array<string>, groups array<string>, "
    "all_allowed boolean"
)


def _check(spark, requests, key_acls, defaults, whitelist, groups):
    req = spark.createDataFrame(
        [(i,) + r for i, r in enumerate(requests)],
        "req_id long, user string, key string, op string",
    )
    out = kmsacl.check_key_access(
        req,
        spark.createDataFrame(key_acls, ACL_SCHEMA),
        spark.createDataFrame(defaults, OP_SCHEMA),
        spark.createDataFrame(whitelist, OP_SCHEMA),
        spark.createDataFrame(groups, "user string, groups array<string>"),
    ).collect()
    return [r["allowed"] for r in sorted(out, key=lambda r: r["req_id"])]


def test_per_key_acl_shadows_defaults(spark):
    # key has ONLY a MANAGEMENT entry; defaults would allow READ for
    # everyone, but the per-key map replaces defaults wholesale
    got = _check(
        spark,
        [("alice", "k", "READ"), ("alice", "other", "READ"),
         ("alice", "k", "MANAGEMENT"), ("bob", "k", "MANAGEMENT")],
        key_acls=[("k", "MANAGEMENT", ["alice"], [], False)],
        defaults=[("READ", [], [], True)],
        whitelist=[],
        groups=[("alice", ["g1"]), ("bob", ["g2"])],
    )
    assert got == [False, True, True, False]


def test_whitelist_rescues_shadow_deny(spark):
    got = _check(
        spark,
        [("wluser", "k", "READ"), ("alice", "k", "READ")],
        key_acls=[("k", "MANAGEMENT", ["alice"], [], False)],
        defaults=[],
        whitelist=[("READ", ["wluser"], [], False)],
        groups=[("wluser", []), ("alice", [])],
    )
    assert got == [True, False]


def test_per_key_all_grants_everything_defaults_cannot(spark):
    # ALL lives only in per-key maps (parseAclsWithPrefix drops it
    # from default/whitelist configs)
    got = _check(
        spark,
        [("carol", "k", "READ"), ("carol", "k", "DECRYPT_EEK"),
         ("carol", "nokey", "READ")],
        key_acls=[("k", "ALL", ["carol"], [], False)],
        defaults=[("READ", ["someone"], [], False)],
        whitelist=[],
        groups=[("carol", [])],
    )
    assert got == [True, True, False]


def test_is_acl_present_gate_denies_unconfigured_op(spark):
    # no per-key map, no default, no whitelist for MANAGEMENT -> deny
    # even though nothing would have matched anyway; READ present via
    # default wildcard
    got = _check(
        spark,
        [("dave", "k", "MANAGEMENT"), ("dave", "k", "READ")],
        key_acls=[],
        defaults=[("READ", [], [], True)],
        whitelist=[],
        groups=[("dave", [])],
    )
    assert got == [False, True]


def test_group_membership_and_unknown_user(spark):
    got = _check(
        spark,
        [("erin", "k", "READ"), ("frank", "k", "READ"),
         ("ghost", "k", "READ")],  # ghost: not in the groups map
        key_acls=[("k", "READ", [], ["geo"], False)],
        defaults=[],
        whitelist=[],
        groups=[("erin", ["geo", "eng"]), ("frank", ["eng"])],
    )
    assert got == [True, False, False]


def test_plan_broadcasts_every_acl_dimension(spark):
    req = spark.createDataFrame(
        [(i, f"u{i % 9}", f"key{i % 3}", "READ") for i in range(60)],
        "req_id long, user string, key string, op string",
    )
    plan = kmsacl.check_key_access(
        req,
        spark.createDataFrame([("key0", "READ", [], [], True)], ACL_SCHEMA),
        spark.createDataFrame([("READ", [], [], True)], OP_SCHEMA),
        spark.createDataFrame([], OP_SCHEMA),
        spark.createDataFrame([(f"u{i}", ["g"]) for i in range(9)],
                              "user string, groups array<string>"),
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
