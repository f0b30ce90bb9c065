"""Router-based federation: mount-table path resolution.

Reference semantics (`hdfs-rbf/server/federation/resolver/`):
- `MountTableResolver.java:381` (`getDestinationForPath`) finds the
  DEEPEST mount entry whose source path is a path-component prefix of
  the request (`:542` — prefix then a '/' boundary, so `/data/dir1`
  does NOT match `/data/dir10`), and rewrites the remainder onto the
  entry's destination path (`:555`).
- entries with several destinations pick one by
  `DestinationOrder`: HASH routes by a hash of the path so the same
  path always lands on the same subcluster (`order/HashResolver.
  java:78` — consistent hashing; here modular hashing over a
  deterministic arithmetic key, same always-sticky property, oracle
  reproducible), LOCAL/RANDOM/SPACE degenerate to the first
  destination in this engine.

Spark-first: the mount table is control-plane-sized, so it collapses
to ONE broadcast array row; each path resolves inside a single
projection with higher-order array functions (filter the matching
entries, pick the deepest by sort, rewrite). Zero shuffles on the
path side at any scale — the same trick the Router uses in memory,
expressed as columnar HOFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ENTRY_T = (
    "struct<src:string,dests:array<struct<ns:string,path:string>>,"
    "policy:string>"
)


def resolve_paths(paths: DataFrame, mounts: DataFrame,
                  path_col: str = "path",
                  hash_col: Column | None = None) -> DataFrame:
    """Resolve every row's `path_col` against the mount table.

    mounts: src (mount source path, no trailing slash, '/' for root),
    dests (array<struct<ns,path>>), policy ('HASH' or anything else =
    first destination). `hash_col`: bigint key the HASH policy mods
    over the destination count (callers supply a deterministic path
    key so external oracles can reproduce the pick; defaults to
    crc32 of the path). Adds mount_src, dest_ns, dest_path (rewritten
    full path), matched (false when no entry — not even root —
    covers the path)."""
    one = mounts.agg(
        F.collect_list(F.struct("src", "dests", "policy")).alias("__mt")
    )
    p = F.col(path_col)
    # deepest entry whose src is the path itself or a '/'-boundary prefix
    best = F.expr(
        f"""get(array_sort(
          filter(__mt, m -> {path_col} = m.src
                           OR startswith({path_col}, m.src || '/')
                           OR m.src = '/'),
          (l, r) -> CASE WHEN length(l.src) > length(r.src) THEN -1
                         WHEN length(l.src) < length(r.src) THEN 1
                         ELSE 0 END), 0)"""
    )
    out = paths.crossJoin(F.broadcast(one)).withColumn("__m", best)
    nd = F.size("__m.dests")
    key = hash_col if hash_col is not None else F.crc32(p.cast("binary"))
    # HASH: sticky per-path pick; others: first destination
    pick = F.when(
        (F.col("__m.policy") == "HASH") & (nd > 1),
        F.get("__m.dests", (F.abs(key) % nd.cast("bigint")).cast("int")),
    ).otherwise(F.get("__m.dests", 0))
    rewritten = F.concat(
        F.col("__d.path"),
        F.when(F.col("__m.src") == "/", p).otherwise(
            F.substring(p, F.length("__m.src") + 1, F.lit(1 << 30))
        ),
    )
    return (
        out.withColumn("__d", pick)
        .select(
            *[c for c in paths.columns],
            F.col("__m.src").alias("mount_src"),
            F.col("__d.ns").alias("dest_ns"),
            F.when(F.col("__m").isNotNull(), rewritten).alias("dest_path"),
            F.col("__m").isNotNull().alias("matched"),
        )
    )


def aggregate_quota(
    usage: DataFrame,
    quotas: DataFrame,
    mount_col: str = "mount_src",
    files_col: str = "n_files",
    bytes_col: str = "n_bytes",
) -> DataFrame:
    """Federation-wide quota view per mount entry (`hdfs-rbf/router/
    Quota.java:127-133` getQuotaUsage → `aggregateQuota` :256 — the
    Router SUMS namespace and space consumption across every
    destination subcluster of a mount and reports it against the
    mount entry's single quota).

    usage: per-(mount, subcluster) consumption rows. quotas: mount,
    ns_quota, ss_quota (-1 = unset, HdfsConstants.QUOTA_RESET).
    One partial-agg groupBy on the mount key plus a broadcast join of
    the (control-plane-sized) quota table. Emits remaining counts and
    the violation flags FSDirectory would throw as
    NSQuotaExceededException / DSQuotaExceededException."""
    agg = usage.groupBy(F.col(mount_col).alias("mount")).agg(
        F.sum(files_col).alias("files_used"),
        F.sum(bytes_col).alias("bytes_used"),
        F.count(F.lit(1)).alias("n_subclusters"),
    )
    q = quotas.select(
        F.col("mount").alias("__qm"), "ns_quota", "ss_quota"
    )
    j = agg.join(F.broadcast(q), agg["mount"] == F.col("__qm"), "left")
    unset = F.lit(-1)
    return j.select(
        "mount",
        "n_subclusters",
        "files_used",
        "bytes_used",
        F.coalesce("ns_quota", unset).alias("ns_quota"),
        F.coalesce("ss_quota", unset).alias("ss_quota"),
        F.when(
            F.coalesce("ns_quota", unset) >= 0,
            F.col("ns_quota") - F.col("files_used"),
        ).alias("ns_remaining"),
        F.when(
            F.coalesce("ss_quota", unset) >= 0,
            F.col("ss_quota") - F.col("bytes_used"),
        ).alias("ss_remaining"),
        (
            (F.coalesce("ns_quota", unset) >= 0)
            & (F.col("files_used") > F.coalesce("ns_quota", unset))
        ).alias("ns_violated"),
        (
            (F.coalesce("ss_quota", unset) >= 0)
            & (F.col("bytes_used") > F.coalesce("ss_quota", unset))
        ).alias("ss_violated"),
    )
