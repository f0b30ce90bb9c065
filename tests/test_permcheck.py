"""FSPermissionChecker evaluation-order pins (hasAclPermission:558-612):
terminal owner match, group-bit masking, non-granting membership
blocking the other fall-through."""

from __future__ import annotations

from hadoop_source_spark.operators import permcheck as pc

SCHEMA = (
    "user string, groups array<string>, owner string, group string, "
    "mode_user int, mode_group int, mode_other int, "
    f"acl {pc.ACL_ENTRY_T}, access int"
)


def _check(spark, rows):
    return pc.check_access(spark.createDataFrame(rows, SCHEMA)).collect()


def test_acl_owner_match_is_terminal_denial(spark):
    # owner bits lack write; other bits would grant — but the owner
    # match is terminal: no fall-through, denied.
    [r] = _check(
        spark,
        [("alice", ["g1"], "alice", "g1", 4, 7, 7,
          [("USER", "bob", 7)], 2)],
    )
    assert (r.allowed, r.decided_by) == (False, "acl_owner")


def test_acl_named_user_masked_by_group_bits(spark):
    # named entry grants rwx(7) but the mask (group bits) is r(4):
    # read passes, write fails — and both are terminal named-user hits.
    base = ("bob", [], "alice", "g1", 7, 4, 0)
    acl = [("USER", "bob", 7)]
    [rd] = _check(spark, [(*base, acl, 4)])
    [wr] = _check(spark, [(*base, acl, 2)])
    assert (rd.allowed, rd.decided_by) == (True, "acl_named_user")
    assert (wr.allowed, wr.decided_by) == (False, "acl_named_user")


def test_acl_nongranting_membership_blocks_other_fallthrough(spark):
    # carol is in g2 whose entry (masked) denies write; other bits
    # would grant — reference semantics: matched-but-denied, NO
    # fall-through to other.
    [r] = _check(
        spark,
        [("carol", ["g2"], "alice", "g1", 7, 7, 7,
          [("USER", "bob", 7), ("GROUP", "g2", 4)], 2)],
    )
    assert (r.allowed, r.decided_by) == (False, "acl_group")


def test_acl_any_granting_group_entry_wins(spark):
    # member of two group entries; only the second grants — allowed.
    [r] = _check(
        spark,
        [("dave", ["g2", "g3"], "alice", "g1", 7, 7, 0,
          [("GROUP", "g2", 4), ("GROUP", "g3", 2)], 2)],
    )
    assert (r.allowed, r.decided_by) == (True, "acl_group")


def test_acl_unnamed_group_entry_uses_inode_group(spark):
    # unnamed GROUP entry → the inode's group g1; erin is a member.
    [r] = _check(
        spark,
        [("erin", ["g1"], "alice", "g1", 7, 6, 0,
          [(("GROUP"), None, 6)], 2)],
    )
    assert (r.allowed, r.decided_by) == (True, "acl_group")


def test_acl_other_only_when_nothing_matched(spark):
    [r] = _check(
        spark,
        [("frank", ["g9"], "alice", "g1", 0, 0, 5,
          [("USER", "bob", 7), ("GROUP", "g2", 7)], 4)],
    )
    assert (r.allowed, r.decided_by) == (True, "acl_other")


def test_classic_paths_without_acl(spark):
    rows = [
        ("alice", [], "alice", "g1", 6, 0, 0, None, 4),   # owner grants
        ("bob", ["g1"], "alice", "g1", 0, 4, 0, None, 4),  # group grants
        ("carol", ["g9"], "alice", "g1", 0, 0, 4, None, 2),  # other denies
    ]
    out = {r.user: r for r in _check(spark, rows)}
    assert (out["alice"].allowed, out["alice"].decided_by) == (True, "classic_owner")
    assert (out["bob"].allowed, out["bob"].decided_by) == (True, "classic_group")
    assert (out["carol"].allowed, out["carol"].decided_by) == (False, "classic_other")


def test_sticky_bit_rule(spark):
    rows = [
        # (user, parent_sticky, parent_owner, owner) → violated?
        ("alice", True, "alice", "bob", False),   # dir owner may delete
        ("bob", True, "alice", "bob", False),     # file owner may delete
        ("carol", True, "alice", "bob", True),    # third party: violated
        ("carol", False, "alice", "bob", False),  # no sticky bit: fine
    ]
    df = spark.createDataFrame(
        [r[:4] for r in rows],
        "user string, parent_sticky boolean, parent_owner string, owner string",
    )
    out = pc.sticky_bit_violation(df).collect()
    got = {(r.user, r.parent_sticky): r.sticky_violated for r in out}
    for user, sticky, po, o, expect in rows:
        assert got[(user, sticky)] == expect, (user, sticky)


def test_acl_transformation_merge_filter_replaceall_and_mask(spark):
    """AclTransformation semantics: -m add/replace, -x remove, -b wipes
    extended entries only, mask recomputed as union(group, named) unless
    explicitly set, and the mask exists only while extended entries do."""
    from hadoop_source_spark.operators import permcheck as pc

    rows = [
        # inode f1: base entries, then named user added twice (replace),
        # a named group, and an explicit mask later removed by -x
        ("f1", "USER", "", 7, "modify", 1),
        ("f1", "GROUP", "", 5, "modify", 2),
        ("f1", "OTHER", "", 4, "modify", 3),
        ("f1", "USER", "alice", 4, "modify", 4),
        ("f1", "USER", "alice", 6, "modify", 5),   # replace wins
        ("f1", "GROUP", "devs", 2, "modify", 6),
        # f2: extended entries wiped by -b; base modified before AND
        # after the wipe
        ("f2", "USER", "", 7, "modify", 1),
        ("f2", "GROUP", "", 6, "modify", 2),
        ("f2", "OTHER", "", 0, "modify", 3),
        ("f2", "USER", "bob", 7, "modify", 4),
        ("f2", "MASK", "", 7, "modify", 5),
        ("f2", "", "", 0, "removeall", 6),
        ("f2", "GROUP", "", 4, "modify", 7),       # base survives + updates
        # f3: explicit mask honored over recompute; named entry removed
        ("f3", "USER", "", 7, "modify", 1),
        ("f3", "GROUP", "", 4, "modify", 2),
        ("f3", "USER", "carol", 2, "modify", 3),
        ("f3", "USER", "dave", 1, "modify", 4),
        ("f3", "USER", "dave", 0, "remove", 5),    # -x removes dave
        ("f3", "MASK", "", 5, "modify", 6),        # explicit mask wins
    ]
    ops = spark.createDataFrame(
        rows,
        "inode string, type string, name string, perm int, op string, "
        "seq long",
    )
    out = {}
    for r in pc.apply_acl_ops(ops).collect():
        out[(r.inode, r.type, r.name)] = (r.perm, r.is_extended)
    # f1: alice replaced to 6; mask = group(5) | alice(6) | devs(2) = 7
    assert out[("f1", "USER", "alice")] == (6, True)
    assert out[("f1", "GROUP", "devs")] == (2, True)
    assert out[("f1", "MASK", "")] == (7, True)
    assert out[("f1", "USER", "")] == (7, False)
    # f2: bob and the mask wiped by -b; base group updated to 4
    assert ("f2", "USER", "bob") not in out
    assert ("f2", "MASK", "") not in out
    assert out[("f2", "GROUP", "")] == (4, False)
    assert out[("f2", "USER", "")] == (7, False)
    # f3: dave removed, carol stays; explicit mask 5 beats recompute 6
    assert ("f3", "USER", "dave") not in out
    assert out[("f3", "USER", "carol")] == (2, True)
    assert out[("f3", "MASK", "")] == (5, True)


def test_acl_explicit_mask_recalculated_on_later_scope_change(spark):
    """calculateMasks (AclTransformation.java:387): a provided mask is
    preserved only while the scope is UNCHANGED — any later setfacl op
    touching another access entry recalculates the mask as
    union(unnamed group, named entries)."""
    from hadoop_source_spark.operators import permcheck as pc

    rows = [
        # f4: explicit mask, then a later NAMED modify → recomputed
        ("f4", "USER", "", 7, "modify", 1),
        ("f4", "GROUP", "", 4, "modify", 2),
        ("f4", "USER", "erin", 2, "modify", 3),
        ("f4", "MASK", "", 1, "modify", 4),
        ("f4", "USER", "erin", 6, "modify", 5),
        # f5: explicit mask, then a later BASE (other::) modify — the
        # scope is dirty even though the group class didn't change →
        # recomputed
        ("f5", "USER", "", 7, "modify", 1),
        ("f5", "GROUP", "", 4, "modify", 2),
        ("f5", "USER", "fay", 2, "modify", 3),
        ("f5", "MASK", "", 0, "modify", 4),
        ("f5", "OTHER", "", 5, "modify", 5),
        # f6: the mask is the FINAL op → honored
        ("f6", "USER", "", 7, "modify", 1),
        ("f6", "GROUP", "", 4, "modify", 2),
        ("f6", "USER", "gil", 2, "modify", 3),
        ("f6", "MASK", "", 1, "modify", 4),
    ]
    ops = spark.createDataFrame(
        rows,
        "inode string, type string, name string, perm int, op string, "
        "seq long",
    )
    out = {(r.inode, r.type, r.name): r.perm
           for r in pc.apply_acl_ops(ops).collect()}
    assert out[("f4", "MASK", "")] == 6   # group(4) | erin(6)
    assert out[("f5", "MASK", "")] == 6   # group(4) | fay(2)
    assert out[("f6", "MASK", "")] == 1   # explicit, scope unchanged
