"""POSIX + ACL permission evaluation — FSPermissionChecker as a column
expression.

Reference semantics (`hdfs/server/namenode/FSPermissionChecker.java`):
`hasPermission` (:511-533) picks owner/group/other mode bits by class
unless the inode carries an access-scope ACL, in which case
`hasAclPermission` (:558-612) runs the POSIX-ACL evaluation order:

1. owner entry from the mode bits if the requester owns the inode —
   a non-granting owner match DENIES (no fall-through);
2. the named USER entry matching the requester, its permission masked
   by the group bits (the mask lives in FsPermission.getGroupAction per
   AclStorage) — match is terminal either way;
3. GROUP entries (unnamed → the inode's group, named → the entry name):
   the requester passes if ANY entry whose group they belong to grants
   the masked access; membership in a non-granting entry still counts
   as a match (blocks the fall-through to other);
4. the other bits only if nothing above matched.

Spark-first: the whole decision is ONE projection of higher-order array
functions over the ACL column — no join, no shuffle, whole-stage
codegen; checking a billion (request × inode) rows is a scan.

Permissions are rwx bitmasks (r=4, w=2, x=1); `implies` is bitwise
cover: (perm & access) == access, exactly FsAction.implies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ACL_ENTRY_T = "array<struct<etype:string,name:string,perm:int>>"


def _implies(perm: Column, access: Column) -> Column:
    return perm.bitwiseAND(access) == access


def check_access(df: DataFrame, access_col: str = "access") -> DataFrame:
    """Adds `allowed` (boolean) and `decided_by` (which rule fired:
    acl_owner / acl_named_user / acl_group / acl_other or
    classic_owner / classic_group / classic_other) to a DataFrame of
    (request × inode) rows with columns: user, groups (array<string>
    the requester belongs to), owner, group, mode_user, mode_group,
    mode_other (rwx ints), acl (ACL_ENTRY_T access-scope entries in
    AclTransformation sorted order; null or empty = no ACL), and
    `access_col` (requested rwx mask)."""
    acc = F.col(access_col)
    has_acl = F.col("acl").isNotNull() & (F.size("acl") > 0)
    is_owner = F.col("user") == F.col("owner")

    # F.get is null-safe on the empty no-match array (ANSI element_at
    # throws on out-of-bounds)
    named_user = F.get(
        F.filter(
            "acl",
            lambda e: (e["etype"] == "USER") & (e["name"] == F.col("user")),
        ),
        0,
    )
    member_groups = F.filter(
        "acl",
        lambda e: (e["etype"] == "GROUP")
        & F.array_contains(
            "groups", F.coalesce(e["name"], F.col("group"))
        ),
    )
    group_matched = F.size(member_groups) > 0
    group_granted = F.exists(
        member_groups,
        lambda e: _implies(e["perm"].bitwiseAND(F.col("mode_group")), acc),
    )

    acl_allowed = (
        F.when(is_owner, _implies(F.col("mode_user"), acc))
        .when(
            named_user.isNotNull(),
            _implies(
                named_user["perm"].bitwiseAND(F.col("mode_group")), acc
            ),
        )
        .when(group_matched, group_granted)
        .otherwise(_implies(F.col("mode_other"), acc))
    )
    acl_rule = (
        F.when(is_owner, F.lit("acl_owner"))
        .when(named_user.isNotNull(), F.lit("acl_named_user"))
        .when(group_matched, F.lit("acl_group"))
        .otherwise(F.lit("acl_other"))
    )

    classic_member = F.array_contains("groups", F.col("group"))
    classic_allowed = (
        F.when(is_owner, _implies(F.col("mode_user"), acc))
        .when(classic_member, _implies(F.col("mode_group"), acc))
        .otherwise(_implies(F.col("mode_other"), acc))
    )
    classic_rule = (
        F.when(is_owner, F.lit("classic_owner"))
        .when(classic_member, F.lit("classic_group"))
        .otherwise(F.lit("classic_other"))
    )

    return df.withColumn(
        "allowed", F.when(has_acl, acl_allowed).otherwise(classic_allowed)
    ).withColumn(
        "decided_by", F.when(has_acl, acl_rule).otherwise(classic_rule)
    )


def sticky_bit_violation(df: DataFrame) -> DataFrame:
    """Adds `sticky_violated`: the delete/rename guard
    (`FSPermissionChecker.checkStickyBit` / `isStickyBitViolated`,
    :614-640): when the parent directory carries the sticky bit, only
    the DIRECTORY owner or the FILE owner may remove the child — write
    permission on the directory is not enough (the /tmp rule).
    Columns: user, parent_sticky (boolean), parent_owner, owner."""
    violated = (
        F.col("parent_sticky")
        & (F.col("user") != F.col("parent_owner"))
        & (F.col("user") != F.col("owner"))
    )
    return df.withColumn("sticky_violated", violated)
