"""Extended-attribute store: apply a setfattr/removefattr feed, enforce
the per-inode limit, and compute namespace visibility.

Reference semantics:
- `hdfs/server/namenode/FSDirXAttrOp.java`: setXAttr replaces an
  existing (namespace, name) value, removeXAttr deletes it; the
  per-inode xattr-count limit (`dfs.namenode.fs-limits.max-xattrs-
  per-inode`, default 32) is checked on every mutation;
- `XAttrPermissionFilter.java` (:60): `user.*` xattrs are visible to
  anyone with path permissions; `trusted.*` only to superusers;
  `security.*` and `system.*` are served to NOBODY through listXAttrs
  (internal use — e.g. encryption-zone keys); `raw.*` only resolves
  under a /.reserved/raw path, superuser-only.

Spark-first: last-writer-wins resolution is one window over the op
feed keyed by (inode, namespace, name) ordered by the op sequence —
the same shape every CDC-merge in this engine uses; the limit check
is a per-inode count. No fold is needed because set/remove are
idempotent per key: only the LAST op on a key decides its presence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VISIBLE_NAMESPACES = ("user", "trusted", "security", "system", "raw")


def apply_xattr_ops(ops: DataFrame, max_per_inode: int = 32) -> DataFrame:
    """Fold the op feed into the live xattr set.

    ops: inode, ns, name, value, op ('set'|'remove'), seq (total order
    per key — edit-log txid). Output: one row per surviving xattr
    (inode, ns, name, value from the last set), plus n_xattrs and
    over_limit per inode — the reference REJECTS the set that would
    exceed the limit; replaying a historical feed we flag the inode
    instead, keeping the declarative shape."""
    w = Window.partitionBy("inode", "ns", "name").orderBy(F.col("seq").desc())
    last = (
        ops.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("op") == "set"))
        .drop("__rn", "op")
    )
    cnt = Window.partitionBy("inode")
    return last.withColumn(
        "n_xattrs", F.count(F.lit(1)).over(cnt)
    ).withColumn("over_limit", F.col("n_xattrs") > max_per_inode)


def visibility_flags(xattrs: DataFrame) -> DataFrame:
    """XAttrPermissionFilter as two boolean projections: what a plain
    user with path access lists vs what a superuser lists.
    security./system. are internal — listed by neither; raw. appears
    only for the superuser AND only under /.reserved/raw (modeled by
    the is_raw_path column when present, else false)."""
    has_raw_path = "is_raw_path" in xattrs.columns
    raw_ok = F.col("is_raw_path") if has_raw_path else F.lit(False)
    return xattrs.withColumn(
        "visible_to_user", F.col("ns") == "user"
    ).withColumn(
        "visible_to_superuser",
        (F.col("ns") == "user")
        | (F.col("ns") == "trusted")
        | ((F.col("ns") == "raw") & raw_ok),
    )
