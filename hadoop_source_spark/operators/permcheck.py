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

from pyspark.sql import Column, DataFrame, Window
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


def apply_acl_ops(ops: DataFrame) -> DataFrame:
    """setfacl feed resolution — `hdfs/server/namenode/
    AclTransformation.java` as relational passes:

    - mergeAclEntries (setfacl -m): add-or-replace an entry keyed by
      (type, name) — last writer wins;
    - filterAclEntries (setfacl -x): remove a named entry;
    - replaceAll (setfacl -b): drop every EXTENDED entry (named users/
      groups and the mask) — the base USER/GROUP/OTHER entries survive
      with whatever bits they last had;
    - the ACCESS-scope mask (AclTransformation.calculateMasks, :356):
      an explicitly-set MASK entry is honored ONLY while no later op
      touches the scope — a provided mask survives "if the scope is
      not dirty or the mask is dirty" (:387), so any SUBSEQUENT
      modify/remove of another entry that arrives without a mask
      recalculates it as the union of the unnamed group entry and
      every named entry; the mask only exists while extended entries
      do.

    Input: inode, type (USER/GROUP/MASK/OTHER), name ('' for unnamed),
    perm (0-7 rwx bitmask), op ('modify'|'remove'|'removeall'), seq
    (total order — edit-log txid; removeall rows carry type='' name='').
    Output: one row per surviving entry (inode, type, name, perm,
    is_extended) with the mask row materialized per the rules above.
    Two keyed windows + one per-inode bit_or — no fold: like the xattr
    store, only the last op per key (relative to the last -b) decides.
    """
    base = (F.col("name") == "") & F.col("type").isin(
        "USER", "GROUP", "OTHER"
    )
    wipe = Window.partitionBy("inode")
    last_b = F.max(
        F.when(F.col("op") == "removeall", F.col("seq"))
    ).over(wipe)
    with_b = ops.withColumn("__b", F.coalesce(last_b, F.lit(-1)))
    alive = (
        with_b.filter(F.col("op") != "removeall")
        # base entries survive -b with their bits; extended entries only
        # exist if touched after the last -b
        .filter(base | (F.col("seq") > F.col("__b")))
    )
    # last non-mask op after the wipe: any such op past the explicit
    # mask's seq makes the scope dirty and forces recalculation
    # (calculateMasks :387 — provided mask survives only an unchanged
    # scope)
    gm = (
        with_b.filter(
            (F.col("op") != "removeall")
            & (F.col("type") != "MASK")
            & (F.col("seq") > F.col("__b"))
        )
        .groupBy("inode")
        .agg(F.max("seq").alias("__gmax"))
    )
    w = Window.partitionBy("inode", "type", "name").orderBy(
        F.col("seq").desc()
    )
    last = (
        alive.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("op") == "modify"))
        .select("inode", "type", "name", "perm", "seq")
    )
    entries = last.filter(F.col("type") != "MASK")
    named = entries.filter(~((F.col("name") == "") & F.col("type").isin(
        "USER", "OTHER"
    )))
    # mask sources: unnamed GROUP + every named USER/GROUP entry
    computed = (
        named.filter(
            (F.col("type") == "GROUP") | (F.col("name") != "")
        )
        .groupBy("inode")
        .agg(
            F.expr("bit_or(perm)").alias("__mperm"),
            F.count(F.when(F.col("name") != "", 1)).alias("__next"),
        )
    )
    explicit = last.filter(F.col("type") == "MASK").select(
        "inode",
        F.col("perm").alias("__eperm"),
        F.col("seq").alias("__eseq"),
    )
    honored = F.col("__eseq") > F.coalesce(F.col("__gmax"), F.lit(-1))
    mask = (
        computed.join(explicit, "inode", "left")
        .join(gm, "inode", "left")
        .filter(F.col("__next") > 0)  # mask exists only with extended entries
        .select(
            "inode",
            F.lit("MASK").alias("type"),
            F.lit("").alias("name"),
            F.when(honored, F.col("__eperm"))
            .otherwise(F.col("__mperm"))
            .alias("perm"),
        )
    )
    return (
        entries.select("inode", "type", "name", "perm")
        .unionByName(mask)
        .withColumn(
            "is_extended",
            (F.col("name") != "") | (F.col("type") == "MASK"),
        )
    )


def proxy_user_authorize(
    requests: DataFrame,
    proxy_conf: DataFrame,
) -> DataFrame:
    """Proxy-user (impersonation) authorization (reference
    `common/security/authorize/DefaultImpersonationProvider.java:109`
    `authorize` — a connection where real user != effective user is
    allowed only when (a) the superuser's proxyuser ACL admits the
    impersonated user by name or by group ('*' admits anyone,
    AccessControlList semantics) AND (b) the client address is on the
    superuser's proxy host list ('*' = any host); a request with no
    real user — no impersonation — passes trivially).

    requests: real_user (null = not proxying), effective_user,
    effective_groups (array<string>), client_host. proxy_conf:
    superuser, allowed_users (array, may hold '*'), allowed_groups
    (array, may hold '*'), allowed_hosts (array, may hold '*') — any
    of the three may be NULL for the unset side of a group-only or
    user-only config (hadoop.proxyuser.X.groups without .users is a
    common real shape; a null list simply admits nothing, it does NOT
    mean unconfigured). NO_PROXY_CONF means the superuser has no row
    in proxy_conf at all — keyed on the join miss, not on any one
    column being null. Output adds allowed (bool) and deny_reason
    (null / 'NO_PROXY_CONF' / 'USER_NOT_ALLOWED' / 'HOST_DENIED').
    One broadcast join on superuser — the proxyuser table is
    conf-sized."""
    empty = F.array().cast("array<string>")
    conf = F.broadcast(
        proxy_conf.select(
            F.col("superuser").alias("real_user"),
            F.coalesce("allowed_users", empty).alias("allowed_users"),
            F.coalesce("allowed_groups", empty).alias("allowed_groups"),
            F.coalesce("allowed_hosts", empty).alias("allowed_hosts"),
            F.lit(True).alias("__has_conf"),
        )
    )
    j = requests.join(conf, "real_user", "left")
    user_ok = (
        F.array_contains("allowed_users", "*")
        | F.array_contains(F.col("allowed_users"), F.col("effective_user"))
        | F.array_contains("allowed_groups", "*")
        | (
            F.size(
                F.array_intersect(
                    "allowed_groups",
                    F.coalesce("effective_groups", empty),
                )
            )
            > 0
        )
    )
    host_ok = F.array_contains("allowed_hosts", "*") | F.array_contains(
        F.col("allowed_hosts"), F.col("client_host")
    )
    reason = (
        F.when(F.col("real_user").isNull(), F.lit(None).cast("string"))
        .when(F.col("__has_conf").isNull(), F.lit("NO_PROXY_CONF"))
        .when(~user_ok, F.lit("USER_NOT_ALLOWED"))
        .when(~host_ok, F.lit("HOST_DENIED"))
    )
    return j.select(
        *requests.columns,
        reason.isNull().alias("allowed"),
        reason.alias("deny_reason"),
    )


def _parse_machine_entry(entry: str) -> tuple[int, int]:
    """(base_int, prefix_len) for one non-wildcard MachineList entry —
    parsed driver-side (the list is conf-sized), matched engine-side."""
    if "/" in entry:
        ip, n = entry.split("/")
        n = int(n)
    else:
        ip, n = entry, 32
    a, b, c, d = (int(x) for x in ip.split("."))
    return (a * 16777216 + b * 65536 + c * 256 + d, n)


def machine_list_includes(
    ip_col: Column | str,
    entries: list[str],
) -> Column:
    """`MachineList.includes` as one codegen'd expression (reference
    `common/util/MachineList.java:44` — the host-list type behind
    proxy-user host restrictions and service ACLs: a list that is
    EXACTLY the singleton ['*'] admits everything (:100 — `size()==1
    && contains(WILDCARD_VALUE)`; a '*' inside a longer list is NOT a
    wildcard, it parses as a literal hostname that can never match a
    dotted-quad address), plain IPs match exactly, and CIDR entries
    match by subnet (:66,:178 SubnetUtils.SubnetInfo.isInRange)).

    The dotted quad becomes a bigint and each CIDR test is a shift
    compare `ip >> (32-n) == base >> (32-n)` — the entry list is
    conf-sized so it compiles into the expression; no join, no UDF."""
    ip = F.col(ip_col) if isinstance(ip_col, str) else ip_col
    if len(entries) == 1 and entries[0] == "*":
        return F.lit(True)
    # non-singleton '*' entries are dead hostname entries (reference
    # parses them into hostNames, which an IP lookup never matches)
    parsed = [_parse_machine_entry(e) for e in entries if e != "*"]
    if not parsed:
        return F.lit(False)
    parts = F.split(ip, r"\.")
    ip_int = (
        F.get(parts, 0).cast("long") * 16777216
        + F.get(parts, 1).cast("long") * 65536
        + F.get(parts, 2).cast("long") * 256
        + F.get(parts, 3).cast("long")
    )
    cond = F.lit(False)
    for base, n in parsed:
        shift = 32 - n
        cond = cond | (
            F.floor(ip_int / (1 << shift)) == (base >> shift)
        )
    return cond
