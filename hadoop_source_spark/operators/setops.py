"""Set operators and snapshot diff.

Snapshot diff re-expresses HDFS snapshot comparison
(hdfs-client/.../protocol/SnapshotDiffReport.java:35, DiffType at :44-48:
CREATE '+', MODIFY 'M', DELETE '-', RENAME 'R') as a keyed full-outer join
between two table versions. RENAME detection requires an identity separate
from the key (HDFS uses inode ids); with a pure-key model a rename shows up
as DELETE+CREATE, which is also what HDFS reports without inode tracking.

Scale: one shuffle on the key columns; value comparison is a null-safe
equality on the compared columns, evaluated JVM-side.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    v1: DataFrame,
    v2: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str] | None = None,
    identity: str | None = None,
) -> DataFrame:
    """Classify rows of v2 vs v1 into '+', '-', 'M' — and 'R' when an
    ``identity`` column is given.

    Without identity, a rename surfaces as delete+create (exactly what
    HDFS reports when inode tracking is unavailable). With identity (the
    inode-id analog), a delete and a create sharing the identity collapse
    into one 'R' row carrying ``dst_<key>`` columns
    (SnapshotDiffReport.DiffType.RENAME, :44-48).

    Returns the key columns plus ``change`` (+ dst keys when identity is
    set); unchanged rows are dropped (the report only lists differences).
    """
    keys = list(keys)
    compare = list(compare if compare is not None else [c for c in v1.columns if c not in keys and c != identity])

    id_cols = [identity] if identity else []
    a = v1.select(*keys, *id_cols, F.struct(*[F.col(c) for c in compare]).alias("__v1"))
    b = v2.select(*keys, *id_cols, F.struct(*[F.col(c) for c in compare]).alias("__v2"))
    joined = a.join(b, on=keys + id_cols, how="full_outer")
    change = (
        F.when(F.col("__v1").isNull(), F.lit("+"))
        .when(F.col("__v2").isNull(), F.lit("-"))
        .when(~F.col("__v1").eqNullSafe(F.col("__v2")), F.lit("M"))
    )
    base = (
        joined.select(*keys, *id_cols, change.alias("change"))
        .filter(F.col("change").isNotNull())
    )
    if not identity:
        return base

    # Pair up (-) and (+) rows sharing the identity → RENAME. ONE
    # groupBy on the identity (a group is a rename iff it holds both a
    # '-' and a '+'), not a minus/plus/anti self-join spider — the diff
    # feeds a single exchange instead of being recomputed per branch
    # (the audit showed 15 exchanges for the join formulation).
    packed = base.groupBy(identity).agg(
        F.collect_list(F.struct("change", *keys)).alias("__cs")
    )
    # try_element_at: most groups hold no '-' or no '+' (ANSI element_at
    # throws on the empty filter result)
    src = F.try_element_at(
        F.filter("__cs", lambda c: c["change"] == "-"), F.lit(1)
    )
    dst = F.try_element_at(
        F.filter("__cs", lambda c: c["change"] == "+"), F.lit(1)
    )
    is_ren = src.isNotNull() & dst.isNotNull()
    rename_rows = packed.filter(is_ren).select(
        *[src[k].alias(k) for k in keys],
        F.col(identity),
        F.lit("R").alias("change"),
        *[dst[k].alias(f"dst_{k}") for k in keys],
    )
    rest = (
        packed.filter(~is_ren)
        .select(F.col(identity), F.explode("__cs").alias("__c"))
        .select(
            *[F.col("__c")[k].alias(k) for k in keys],
            identity,
            F.col("__c")["change"].alias("change"),
            *[
                F.lit(None).cast(a.schema[k].dataType).alias(f"dst_{k}")
                for k in keys
            ],
        )
    )
    return rest.unionByName(rename_rows)


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """ViewFs-style union of N conformant sources (ViewFileSystem.java:89)."""
    return reduce(lambda x, y: x.unionByName(y), dfs)


def snapshot_delete_reclaim(
    files: DataFrame,
    snapshots: DataFrame,
) -> DataFrame:
    """Bytes reclaimed by deleting each snapshot (reference
    `hdfs/server/namenode/snapshot/FileWithSnapshotFeature.java`
    collectBlocksAndClear — a deleted file's blocks are destroyed only
    once NO remaining snapshot still references it; until then the
    snapshot keeps them alive — and `SnapshotManager.deleteSnapshot`,
    which triggers exactly this sweep).

    files: file_id, bytes, created_gen, deleted_gen (null = still
    live — never reclaimable by a snapshot delete). snapshots: gen.
    A dead file is retained by snapshot g iff created_gen <= g <
    deleted_gen; deleting g reclaims the files whose ONLY retaining
    snapshot is g. Output per snapshot gen: n_sole_files,
    reclaimed_bytes (0 rows appear too, for snapshots holding
    nothing exclusively).

    Shape: files × snapshots containment is an equi-free theta join,
    but the snapshot list is control-plane-sized → broadcast; then one
    file-keyed agg (retainer count) and one snapshot-keyed rollup."""
    dead = files.filter(F.col("deleted_gen").isNotNull())
    snaps = F.broadcast(snapshots.select(F.col("gen")))
    retained = dead.join(
        snaps,
        (F.col("created_gen") <= F.col("gen"))
        & (F.col("gen") < F.col("deleted_gen")),
    )
    sole = (
        retained.groupBy("file_id", "bytes")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min("gen").alias("__g"),
        )
        .filter(F.col("__n") == 1)
    )
    per_snap = sole.groupBy(F.col("__g").alias("gen")).agg(
        F.count(F.lit(1)).alias("n_sole_files"),
        F.sum("bytes").alias("reclaimed_bytes"),
    )
    return (
        snapshots.join(per_snap, "gen", "left")
        .select(
            "gen",
            F.coalesce("n_sole_files", F.lit(0)).alias("n_sole_files"),
            F.coalesce("reclaimed_bytes", F.lit(0)).alias("reclaimed_bytes"),
        )
    )
