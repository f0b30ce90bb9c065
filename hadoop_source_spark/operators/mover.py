"""Storage-policy tiering: policy resolution by namespace inheritance +
the mover's migration plan (reference: hdfs storage policies —
BlockStoragePolicySuite.java's HOT/WARM/COLD/ALL_SSD/ONE_SSD replica
tier templates, policies set per DIRECTORY and inherited by the subtree
(FSDirAttrOp.setStoragePolicy); `hdfs mover` then migrates any replica
whose current storage type differs from the policy's template —
Mover.java).

Spark-first shapes:
- policy resolution is a LONGEST-PREFIX-MATCH join: each file explodes
  into its ancestor prefixes (one generate, fan-out = path depth, which
  is bounded), equi-joins the BROADCAST policy dimension, and keeps the
  deepest match with max_by — no regex scan of the namespace per policy.
- the mover plan is a projection comparing each replica's current tier
  with its policy template slot; only mismatches move (work proportional
  to the drift, like the real mover's iteration over misplaced blocks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# replica storage-type templates per policy (BlockStoragePolicySuite):
# slot i = storage type of replica i (3-replica layout; extra replicas
# take the last slot's type, matching the suite's fallback arrays).
POLICY_TEMPLATES: dict[str, list[str]] = {
    "HOT": ["DISK", "DISK", "DISK"],
    "WARM": ["DISK", "ARCHIVE", "ARCHIVE"],
    "COLD": ["ARCHIVE", "ARCHIVE", "ARCHIVE"],
    "ALL_SSD": ["SSD", "SSD", "SSD"],
    "ONE_SSD": ["SSD", "DISK", "DISK"],
}


def ancestor_prefixes(path_col: str):
    """All ancestor directory prefixes of an absolute path, the path
    itself included: '/a/b/c' -> ['/a', '/a/b', '/a/b/c']."""
    return F.expr(
        f"transform(sequence(2, size(split({path_col}, '/'))), "
        f"i -> array_join(slice(split({path_col}, '/'), 1, i), '/'))"
    )


def resolve_policies(
    files: DataFrame,
    policies: DataFrame,
    path_col: str = "path",
    default_policy: str = "HOT",
) -> DataFrame:
    """Attach the effective storage policy to every file: the policy of
    the DEEPEST ancestor with one set, falling back to the default
    (unset namespaces are HOT, as in the reference). ``policies``:
    (prefix, policy)."""
    pref = files.select(
        path_col, F.explode(ancestor_prefixes(path_col)).alias("prefix")
    )
    hit = (
        pref.join(F.broadcast(policies), "prefix")
        .groupBy(path_col)
        .agg(F.max_by("policy", F.length("prefix")).alias("policy"))
    )
    return files.join(hit, path_col, "left").withColumn(
        "policy", F.coalesce("policy", F.lit(default_policy))
    )


def mover_plan(
    replicas: DataFrame,
    policies: DataFrame,
    path_col: str = "path",
    idx_col: str = "replica_idx",
    tier_col: str = "tier",
    default_policy: str = "HOT",
) -> DataFrame:
    """Migration plan: every replica whose current storage type differs
    from its policy template slot. ``replicas``: (path, replica_idx
    1-based, tier). Returns (path, replica_idx, policy, from_tier,
    to_tier) for mismatches only."""
    resolved = resolve_policies(
        replicas.select(path_col).distinct(), policies, path_col,
        default_policy,
    )
    tmpl = F.create_map(
        *[
            x
            for p, slots in sorted(POLICY_TEMPLATES.items())
            for x in (F.lit(p), F.array(*[F.lit(s) for s in slots]))
        ]
    )
    return (
        replicas.join(resolved, path_col)
        .withColumn(
            "__target",
            F.element_at(
                tmpl[F.col("policy")],
                F.least(F.col(idx_col), F.lit(3)).cast("int"),
            ),
        )
        .filter(F.col(tier_col) != F.col("__target"))
        .select(
            path_col,
            idx_col,
            "policy",
            F.col(tier_col).alias("from_tier"),
            F.col("__target").alias("to_tier"),
        )
    )


def quota_by_storage_type(
    files: DataFrame,
    quotas: DataFrame,
    dir_col: str = "dir",
    size_col: str = "size",
    policy_col: str = "policy",
) -> DataFrame:
    """Per-(directory, storage type) space consumption vs typed quota —
    `DirectoryWithQuotaFeature.verifyQuotaByStorageType` /
    `QuotaByStorageTypeExceededException` (`hdfs dfsadmin -setSpaceQuota
    … -storageType`): a file consumes size × (replicas of that type in
    its storage policy's template), so one HOT file charges DISK 3x
    while ONE_SSD charges SSD 1x + DISK 2x.

    `quotas`: (dir_col, stype, quota) — a bounded dim, broadcast; a
    missing row means no typed quota (reference semantics: unlimited,
    never exceeded). The template dim is replica-slot counts derived
    from POLICY_TEMPLATES (≤ policies × types rows). One broadcast-join
    scan + one (dir × type)-sized partial-agg groupBy — nothing
    data-sized shuffles at any corpus scale."""
    spark = files.sparkSession
    tdim = spark.createDataFrame(
        [
            (p, s, slots.count(s))
            for p, slots in sorted(POLICY_TEMPLATES.items())
            for s in sorted(set(slots))
        ],
        f"{policy_col} string, stype string, n_rep int",
    )
    consumed = (
        files.join(F.broadcast(tdim), policy_col)
        .groupBy(dir_col, "stype")
        .agg(F.sum(F.col(size_col) * F.col("n_rep")).alias("consumed"))
    )
    return (
        consumed.join(F.broadcast(quotas), [dir_col, "stype"], "left")
        .select(
            dir_col,
            "stype",
            "consumed",
            "quota",
            (F.col("quota") - F.col("consumed")).alias("remaining"),
            F.coalesce(
                F.col("consumed") > F.col("quota"), F.lit(False)
            ).alias("exceeded"),
        )
    )
