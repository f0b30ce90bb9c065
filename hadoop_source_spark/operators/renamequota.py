"""Rename quota verification: the ancestor-suffix walk between the
destination parent and the last common ancestor.

Reference semantics:
- `namenode/FSDirRenameOp.java:70-93 (verifyQuotaForRename)` — the
  delta is the moved inode's quota usage (namespace count, storage
  space = bytes x replication) MINUS the usage of a destination inode
  the rename overwrites; verification then walks the destination path.
- `namenode/FSDirectory.java:1202-1228 (verifyQuota)` — the walk is
  skipped entirely when every delta component is <= 0; otherwise it
  runs from the destination PARENT upward and STOPS at the last
  common ancestor of src and dst (quota above it is unchanged — the
  subtree leaves and arrives under the same directory) — UNLESS the
  common ancestor is in the latest snapshot, in which case the walk
  keeps going to the root (the snapshot retains the source copy, so
  the delta does apply above).
- `namenode/DirectoryWithQuotaFeature.java:185-224 (verifyQuota)` —
  per directory, namespace is checked BEFORE storage space; a quota
  of -1 is unset.
- `namenode/Quota.java:61-64 (isViolated)` — violated iff quota >= 0
  AND delta > 0 AND usage > quota - delta.

Spark-first scale shape: the common-ancestor depth is pure array
arithmetic on the two paths (zip + first-mismatch — no tree walk);
the checked dirs come from the same depth-bounded ancestor-chain
explode as enczones.resolve_zones; quota-bearing directories are a
control-plane-sized broadcast. One explode, one broadcast join, one
per-op window pick — partition-parallel on op_id at any rename rate.
Storage-TYPE quotas (the third check in the reference) are modeled
by the storage_type_quota_report operator; this one carries ns+ss,
as documented.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hadoop_source_spark.operators.enczones import _ancestor_chain


def _common_depth(src: Column, dst: Column) -> Column:
    """Component depth of the last common ancestor of two absolute
    paths ('/a/b/x' vs '/a/b/y' -> 2; '/a/p' vs '/b/q' -> 0)."""
    sp, dp = F.split(src, "/"), F.split(dst, "/")
    eqs = F.zip_with(sp, dp, lambda a, b: a.eqNullSafe(b))
    first_diff = F.array_position(eqs, False)  # 1-based; 0 = no diff
    return (
        F.when(first_diff > 0, first_diff - 1)
        .otherwise(F.least(F.size(sp), F.size(dp)))
        - 1
    ).cast("int")


def _parent(path: Column) -> Column:
    p = F.regexp_replace(path, "/[^/]+$", "")
    return F.when(p == "", F.lit("/")).otherwise(p)


def precheck(
    renames: DataFrame, quota_dirs: DataFrame, snapshot_dirs: DataFrame
) -> DataFrame:
    """Verify every rename against the quota suffix walk.

    `renames`: (op_id, src, dst, delta_ns long, delta_ss long) —
    deltas already net of any overwritten destination inode;
    `quota_dirs`: (dir_path, ns_quota, ss_quota, ns_used, ss_used;
    -1 = unset); `snapshot_dirs`: (dir_path) in the latest snapshot.
    Returns op keys + verdict OK / NS_QUOTA / SS_QUOTA + the deepest
    violating directory (the one the reference names in its
    exception)."""
    base = renames.select(
        "op_id",
        "src",
        "dst",
        "delta_ns",
        "delta_ss",
        _common_depth(F.col("src"), F.col("dst")).alias("__cd"),
        F.array_join(
            F.slice(
                F.split("dst", "/"),
                1,
                _common_depth(F.col("src"), F.col("dst")) + 1,
            ),
            "/",
        ).alias("__common"),
    ).join(
        F.broadcast(
            snapshot_dirs.select(
                F.col("dir_path").alias("__common"),
                F.lit(True).alias("__snap"),
            )
        ),
        "__common",
        "left",
    ).withColumn("__snap", F.coalesce("__snap", F.lit(False)))
    # verifyQuota's <=0 early return is an optimization, not extra
    # semantics: isViolated's own `delta > 0` term makes a non-positive
    # component unable to violate anywhere, so one pass suffices.
    # The chain's depth-0 sentinel ('' — matches no quota dir) keeps
    # every op alive through the left join; no join-back pass.
    cand = base.select(
        "op_id",
        "src",
        "dst",
        "delta_ns",
        "delta_ss",
        "__cd",
        "__snap",
        F.explode(
            _ancestor_chain(_parent(F.col("dst")), F.lit(True))
        ).alias("__c"),
    ).where(
        # stop at the common ancestor going up — unless it is in the
        # latest snapshot, which keeps the walk alive to the root
        F.col("__snap")
        | (F.col("__c.depth") > F.col("__cd"))
        | (F.col("__c.depth") == 0)
    )
    hits = cand.join(
        F.broadcast(quota_dirs),
        cand["__c.anc"] == quota_dirs["dir_path"],
        "left",
    )
    viol_ns = (
        (F.col("ns_quota") >= 0)
        & (F.col("delta_ns") > 0)
        & (F.col("ns_used") > F.col("ns_quota") - F.col("delta_ns"))
    )
    viol_ss = (
        (F.col("ss_quota") >= 0)
        & (F.col("delta_ss") > 0)
        & (F.col("ss_used") > F.col("ss_quota") - F.col("delta_ss"))
    )
    verdict_here = F.when(viol_ns, F.lit("NS_QUOTA")).when(
        viol_ss, F.lit("SS_QUOTA")
    )
    pick = Window.partitionBy("op_id").orderBy(
        verdict_here.isNull().asc(), F.col("__c.depth").desc()
    )
    return (
        hits.withColumn("__verdict", verdict_here)
        .withColumn("__rn", F.row_number().over(pick))
        .where(F.col("__rn") == 1)
        .select(
            "op_id",
            "src",
            "dst",
            "delta_ns",
            "delta_ss",
            F.coalesce("__verdict", F.lit("OK")).alias("verdict"),
            F.when(F.col("__verdict").isNotNull(), F.col("dir_path"))
            .alias("violating_dir"),
        )
    )
