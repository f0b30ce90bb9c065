"""Short-circuit read replica cache sweep: how an HDFS client decides
which local-read replicas (file descriptors + mmaps) to keep.

Reference semantics (`hadoop-hdfs-client/.../shortcircuit/
ShortCircuitCache.java`):

- A replica with references beyond the cache's own is not in any
  eviction map (``unref:440-508``: it is inserted at the moment the
  refCount drops to 1, keyed by nanoTime, into ``evictableMmapped``
  or ``evictable`` by mmap state).
- ``demoteOldEvictableMmaped:510-549``: walk the mmapped eviction
  map oldest-first; munmap + move into the regular map while the
  eldest is past ``maxEvictableMmapedLifespanMs`` ("too old") OR the
  map still holds ``maxEvictableMmapedSize`` or more entries ("need
  more space"); the moved entry KEEPS its original eviction time.
  Because times are sorted, the demoted set is the prefix
  ``too-old ∪ (index ≤ M - maxEvictableMmapedSize)``.
- Cleaner run (``CacheCleaner.run:101-134``): demote, then purge
  from the regular map oldest-first while the eldest is past
  ``maxNonMmappedEvictableLifespanMs`` — mmapped entries are never
  lifespan-purged directly, they age through demotion first.
- ``trimEvictionMaps:551-573`` (the unref path): demote, then purge
  while regular + mmapped exceed ``maxTotalSize`` — draining the
  REGULAR map oldest-first and only then the mmapped map.

This operator runs the composite sweep (demote → lifespan purge →
size trim; demotion is idempotent so composing the cleaner run with
the trim that fires on the next unref is exact) as closed-form
window arithmetic: every rule is a prefix of a per-cache
time-ordered walk, so conditional running counts over ONE cache_id
partitioning replace the sequential loops — a million client caches
sweep in a single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

IN_USE = "IN_USE"
PURGED_LIFESPAN = "PURGED_LIFESPAN"
PURGED_TRIM = "PURGED_TRIM"
RETAINED_MMAP = "RETAINED_MMAP"
RETAINED_REGULAR = "RETAINED_REGULAR"


def cache_sweep(
    replicas: DataFrame, confs: DataFrame, *, now_ms: int
) -> DataFrame:
    """One composite eviction sweep over every client cache.

    ``replicas``: (cache_id long, conf_id, rkey string,
    ref_count int, mmapped boolean, evictable_time_ns long nullable
    — null while the replica holds external references). ``confs``:
    (conf_id, max_total int, max_mmaped int, nonmmap_life_ms long,
    mmap_life_ms long) — the fleet's few distinct client
    configurations, broadcast (a conf per cache instance in the
    reference; caches sharing a config share a conf_id row here so
    the conf side stays conf-sized at any cache count).

    Returns (cache_id, rkey, action, demoted boolean nullable,
    demote_reason 'age'|'space' nullable)."""
    r = replicas.join(F.broadcast(confs), "conf_id")
    t_ns = F.col("evictable_time_ns")
    # TimeUnit.MILLISECONDS.convert(ns) truncates (:116-118)
    t_ms = F.expr("evictable_time_ns div 1000000")
    in_maps = (F.col("ref_count") == 1) & t_ns.isNotNull()
    mm = in_maps & F.col("mmapped")

    by_t = Window.partitionBy("cache_id").orderBy(
        "evictable_time_ns", "rkey"
    )
    prefix = by_t.rowsBetween(Window.unboundedPreceding, -1)
    whole = Window.partitionBy("cache_id")

    # stage 1 — demoteOldEvictableMmaped: a prefix of the mmapped
    # list (windows over input columns only; each later stage's
    # windows consume materialized columns, never nested windows)
    s1 = r.select(
        "*",
        in_maps.alias("_in_maps"),
        mm.alias("_mm"),
        (mm & (t_ms + F.col("mmap_life_ms") < now_ms)).alias("_old_mm"),
        (t_ms + F.col("nonmmap_life_ms") < now_ms).alias("_old_reg"),
        F.coalesce(
            F.sum(F.when(mm, 1).otherwise(0)).over(prefix), F.lit(0)
        ).alias("_i_mm"),
        F.sum(F.when(mm, 1).otherwise(0)).over(whole).alias("_m"),
    )
    demoted = F.col("_mm") & (
        F.col("_old_mm")
        | (F.col("_i_mm") <= F.col("_m") - F.col("max_mmaped"))
    )
    # CacheCleaner purge: regular list (originals + demoted, which
    # keep their eviction time) past the non-mmapped lifespan
    regular = F.col("_in_maps") & (~F.col("mmapped") | demoted)
    s2 = s1.select(
        "*",
        demoted.alias("_demoted"),
        (regular & F.col("_old_reg")).alias("_purged_life"),
        (regular & ~F.col("_old_reg")).alias("_reg_surv"),
        (F.col("_mm") & ~demoted).alias("_mm_surv"),
    )
    # stage 3 — trimEvictionMaps: drain the regular survivors
    # oldest-first, then the mmapped survivors
    s3 = s2.select(
        "*",
        F.sum(
            F.when(F.col("_reg_surv") | F.col("_mm_surv"), 1).otherwise(0)
        ).over(whole).alias("_total_surv"),
        F.sum(F.when(F.col("_reg_surv"), 1).otherwise(0))
        .over(whole).alias("_n_reg"),
        (
            F.coalesce(
                F.sum(F.when(F.col("_reg_surv"), 1).otherwise(0))
                .over(prefix),
                F.lit(0),
            )
            + 1
        ).alias("_rank_reg"),
        (
            F.coalesce(
                F.sum(F.when(F.col("_mm_surv"), 1).otherwise(0))
                .over(prefix),
                F.lit(0),
            )
            + 1
        ).alias("_rank_mm"),
    )
    excess = F.col("_total_surv") - F.col("max_total")
    trim_reg = F.col("_reg_surv") & (F.col("_rank_reg") <= excess)
    trim_mm = F.col("_mm_surv") & (
        F.col("_rank_mm") <= excess - F.col("_n_reg")
    )
    action = (
        F.when(~F.col("_in_maps"), IN_USE)
        .when(F.col("_purged_life"), PURGED_LIFESPAN)
        .when(trim_reg | trim_mm, PURGED_TRIM)
        .when(F.col("_mm_surv"), RETAINED_MMAP)
        .otherwise(RETAINED_REGULAR)
    )
    return s3.select(
        "cache_id",
        "rkey",
        action.alias("action"),
        F.when(F.col("_in_maps"), F.col("_demoted")).alias("demoted"),
        F.when(F.col("_old_mm") & F.col("_demoted"), "age")
        .when(F.col("_demoted"), "space")
        .alias("demote_reason"),
    )
