"""HDFS encryption zones: nearest-ancestor resolution and rename
validity.

Reference semantics:
- `namenode/EncryptionZoneManager.java:391-431
  (getEncryptionZoneForPath)` — walk the INodesInPath from the LEAF
  upward and return the first inode that is an EZ root ("encryption
  zone is supported on directory only": non-directory inodes are
  skipped, so a file's candidates are its ancestors while a directory
  is its own first candidate). Nested zones are legal
  (`createEncryptionZone:542-556` rejects only a duplicate on the
  same inode), and nearest-ancestor means the INNER zone wins — the
  file's DEK is wrapped with the innermost zone key.
- `EncryptionZoneManager.java:440-446
  (getParentEncryptionZoneForPath)` — rename checks resolve the
  PARENT path's zone, excluding the renamed inode itself (a zone root
  whose parent is unencrypted is itself movable).
- `EncryptionZoneManager.java:477-531 (checkMoveValidity +
  checkMoveValidityForReencryption)` — a rename fails when exactly
  one side is in a zone ("can't be moved from/into an encryption
  zone"), when both sides sit in DIFFERENT zones, or when the shared
  zone has a re-encryption in a state other than Completed; otherwise
  it proceeds.

Spark-first scale shape: the naive longest-prefix match is a cross
join (paths × zones with LIKE) — quadratic and unprunable. This
module explodes each path into its ancestor chain instead (bounded by
path DEPTH, ~16 even on 100 TB namespaces), equi-joins the chain
against the broadcast zone table, and keeps the deepest hit with one
per-path window — the same chain-explode + equi-join shape the span
dedup and edit-log operators use. Zone registries are control-plane
tables (a NameNode holds thousands of zones, not billions) so the
join side always broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ancestor_chain(path: Column, is_dir: Column) -> Column:
    """Array of (prefix, depth) candidates for the EZ walk: every
    proper ancestor, plus the path itself when it is a directory.
    '/a/b/c' -> ['/a' 1, '/a/b' 2, ('/a/b/c' 3 iff dir)]."""
    parts = F.split(path, "/")  # leading '' keeps prefixes rooted
    n_comp = F.size(parts) - 1
    chain = F.filter(
        F.transform(
            F.sequence(F.lit(1), n_comp),
            lambda i: F.struct(
                F.array_join(F.slice(parts, 1, i + 1), "/").alias("anc"),
                i.alias("depth"),
            ),
        ),
        lambda s: (s["depth"] < n_comp) | is_dir,
    )
    # depth-0 sentinel ('' matches no zone) keeps zone-less paths alive
    # through the single left join — no join-back pass needed
    return F.concat(
        F.array(F.struct(F.lit("").alias("anc"), F.lit(0).alias("depth"))),
        chain,
    )


def resolve_zones(paths: DataFrame, zones: DataFrame) -> DataFrame:
    """Nearest-ancestor zone for every path — getEncryptionZoneForPath
    as a chain-explode + broadcast equi-join + deepest-hit window.

    `paths`: (path string, is_dir boolean); `zones`: (zone_path,
    key_name, suite, reenc_state). Output keeps every input path;
    zone columns are NULL outside any zone."""
    cand = paths.select(
        "path",
        "is_dir",
        F.explode(_ancestor_chain(F.col("path"), F.col("is_dir"))).alias(
            "__c"
        ),
    ).select(
        "path",
        "is_dir",
        F.col("__c.anc").alias("__anc"),
        F.col("__c.depth").alias("__depth"),
    )
    hits = cand.join(
        F.broadcast(zones), cand["__anc"] == zones["zone_path"], "left"
    )
    # the inode identity is (path, is_dir) — a FILE at a zone-root PATH
    # must not inherit the directory row's self-resolution. Deepest HIT
    # first; the depth-0 sentinel row loses to any hit and carries the
    # NULL zone columns for paths outside every zone.
    deepest = Window.partitionBy("path", "is_dir").orderBy(
        F.col("zone_path").isNull().asc(), F.col("__depth").desc()
    )
    return (
        hits.withColumn("__rn", F.row_number().over(deepest))
        .where(F.col("__rn") == 1)
        .select("path", "is_dir", "zone_path", "key_name", "suite",
                "reenc_state")
    )


def _parent(path: Column) -> Column:
    """Parent directory of a path ('/a/b/c' -> '/a/b'); single-component
    paths parent to '/' (never a zone root here, as in the reference
    where root cannot be below any zone)."""
    p = F.regexp_replace(path, "/[^/]+$", "")
    return F.when(p == "", F.lit("/")).otherwise(p)


def check_moves(renames: DataFrame, zones: DataFrame) -> DataFrame:
    """Classify rename ops — checkMoveValidity over the PARENT zones.

    `renames`: (op_id, src, dst). Returns (op_id, src, dst, src_zone,
    dst_zone, action) with action in OK / ERR_FROM_EZ / ERR_INTO_EZ /
    ERR_CROSS_EZ / ERR_REENCRYPTION."""
    parents = (
        renames.select(_parent(F.col("src")).alias("path"))
        .unionByName(renames.select(_parent(F.col("dst")).alias("path")))
        .distinct()
        .withColumn("is_dir", F.lit(True))
    )
    rz = resolve_zones(parents, zones)
    src_z = rz.select(
        F.col("path").alias("__sp"),
        F.col("zone_path").alias("src_zone"),
        F.col("reenc_state").alias("__s_state"),
    )
    dst_z = rz.select(
        F.col("path").alias("__dp"),
        F.col("zone_path").alias("dst_zone"),
    )
    j = (
        renames.withColumn("__sp", _parent(F.col("src")))
        .withColumn("__dp", _parent(F.col("dst")))
        .join(F.broadcast(src_z), "__sp", "left")
        .join(F.broadcast(dst_z), "__dp", "left")
    )
    src_in = F.col("src_zone").isNotNull()
    dst_in = F.col("dst_zone").isNotNull()
    return j.select(
        "op_id",
        "src",
        "dst",
        "src_zone",
        "dst_zone",
        F.when(src_in & ~dst_in, F.lit("ERR_FROM_EZ"))
        .when(dst_in & ~src_in, F.lit("ERR_INTO_EZ"))
        .when(
            src_in & dst_in & (F.col("src_zone") != F.col("dst_zone")),
            F.lit("ERR_CROSS_EZ"),
        )
        .when(
            src_in & (F.col("__s_state") != "Completed"),
            F.lit("ERR_REENCRYPTION"),
        )
        .otherwise(F.lit("OK"))
        .alias("action"),
    )
