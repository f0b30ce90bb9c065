"""KMS key ACLs: the per-key / default / whitelist authorization
lattice.

Reference semantics:
- `kms/server/KMSACLs.java:115-165 (setKeyACLs)` — `key.acl.<key>.<op>`
  entries build a per-key map; `default.key.acl.<op>` and
  `whitelist.key.acl.<op>` build fallback/override maps, both of
  which IGNORE the ALL pseudo-op (`parseAclsWithPrefix:180-183` —
  only per-key ACLs may grant ALL).
- `KMSACLs.java:288-301 (checkKeyAccess)` — if the key has ANY
  per-key ACL, that map fully SHADOWS the defaults (a key with only a
  MANAGEMENT entry denies READ even when a default READ ACL exists);
  a missing op entry in the chosen map denies.
- `KMSACLs.java:277-286 (hasAccessToKey)` — per-key-or-default check
  OR'd with the whitelist (the whitelist can rescue a shadow-denied
  op).
- `KMSACLs.java:303-308 (isACLPresent)` — present iff the key has a
  per-key map OR the op has a default OR a whitelist entry.
- `KeyAuthorizationKeyProvider.java:139-152 (checkAccess)` — ALLOW
  iff isACLPresent(key, op) AND (hasAccessToKey(op) OR
  hasAccessToKey(ALL)); an entirely unconfigured op denies.
- `security/authorize/AccessControlList.java:230-245` — an ACL entry
  admits by wildcard, short user name, or any group intersection.

Spark-first scale shape: the request stream is data-sized; every ACL
table and the user→groups map are configuration-sized dimensions.
Each lookup is a broadcast equi-join (key+op, key+'ALL', op) feeding
one cascading boolean expression — zero data-sized shuffles, one
codegen stage after the joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPS = ("READ", "MANAGEMENT", "GENERATE_EEK", "DECRYPT_EEK")


def _allows(prefix: str) -> Column:
    """AccessControlList.isUserInList over a joined entry whose columns
    are <prefix>_all / <prefix>_users / <prefix>_groups; NULL columns
    (no entry) deny."""
    return F.coalesce(
        F.col(f"{prefix}_all")
        | F.array_contains(F.col(f"{prefix}_users"), F.col("user"))
        | F.arrays_overlap(F.col(f"{prefix}_groups"), F.col("groups")),
        F.lit(False),
    )


def _entry(acls: DataFrame, prefix: str, *join_on: str) -> DataFrame:
    return acls.select(
        *join_on,
        F.col("all_allowed").alias(f"{prefix}_all"),
        F.col("users").alias(f"{prefix}_users"),
        F.col("groups").alias(f"{prefix}_groups"),
    )


def check_key_access(
    requests: DataFrame,
    key_acls: DataFrame,
    default_acls: DataFrame,
    whitelist_acls: DataFrame,
    user_groups: DataFrame,
) -> DataFrame:
    """checkAccess for every (req_id, user, key, op) request row.

    `key_acls`: (key, op, users array<string>, groups array<string>,
    all_allowed boolean) — op may be 'ALL'; `default_acls` /
    `whitelist_acls`: same minus key (ALL rows must not appear, as
    the reference parser drops them); `user_groups`: (user, groups).
    Returns the request keys + allowed boolean."""
    ka_op = _entry(key_acls, "ko", "key", "op")
    ka_all = _entry(
        key_acls.where(F.col("op") == "ALL"), "ka", "key"
    )
    d_op = _entry(default_acls, "do", "op")
    w_op = _entry(whitelist_acls, "wo", "op")
    keyed = key_acls.select("key").distinct().withColumn(
        "__has_key_acl", F.lit(True)
    )
    j = (
        requests.join(F.broadcast(user_groups), "user", "left")
        .withColumn("groups", F.coalesce("groups", F.array().cast("array<string>")))
        .join(F.broadcast(keyed), "key", "left")
        .withColumn("__has_key_acl", F.coalesce("__has_key_acl", F.lit(False)))
        .join(F.broadcast(ka_op), ["key", "op"], "left")
        .join(F.broadcast(ka_all), ["key"], "left")
        .join(F.broadcast(d_op), ["op"], "left")
        .join(F.broadcast(w_op), ["op"], "left")
    )
    # checkKeyAccess(op): per-key map if the key has ANY acl (shadowing
    # defaults even when the op entry is absent), else defaults
    base_op = F.when(F.col("__has_key_acl"), _allows("ko")).otherwise(
        _allows("do")
    )
    # ...(ALL): defaults/whitelist never hold ALL, so only per-key
    base_all = F.when(F.col("__has_key_acl"), _allows("ka")).otherwise(
        F.lit(False)
    )
    has_op = base_op | _allows("wo")
    present = (
        F.col("__has_key_acl")
        | F.col("do_all").isNotNull()
        | F.col("wo_all").isNotNull()
    )
    return j.select(
        "req_id",
        "user",
        "key",
        "op",
        (present & (has_op | base_all)).alias("allowed"),
    )
