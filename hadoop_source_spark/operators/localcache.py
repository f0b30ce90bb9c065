"""NM localization-cache cleanup: the LRU delete-to-target sweep over
a node's PUBLIC + per-user PRIVATE resource caches, with in-use
resources exempt and the per-visibility deletion stats record.

Reference semantics (`hadoop-yarn-server-nodemanager/.../localizer/`):

- ``LocalCacheCleaner.java:35`` — one cleaner per node covers the
  public tracker AND every private tracker in a SINGLE LRU order
  against a single target size
  (``ResourceLocalizationService.java:534-541`` handleCacheCleanup).
- ``addResources:67-76``: ``currentSize`` accumulates EVERY tracked
  resource's size — including in-use ones — but only resources with
  ``refCount == 0`` become deletion candidates.
- ``cleanCache:84-99``: walk candidates in comparator order, deleting
  while ``currentSize - totalDelSize > targetSize`` (checked before
  each removal). ``LRUComparator:169-180`` orders by timestamp
  ascending; its identityHashCode tiebreak is nondeterministic, so
  this plan breaks ties on the resource id (documented deviation).
- ``LocalResourcesTrackerImpl.remove:382-406``: an ABSENT resource
  logs and returns true (its size still counts in the stats!); a
  re-referenced or DOWNLOADING resource returns false (iterated but
  nothing freed, nothing counted); INIT removes tracking without a
  file-deletion task; LOCALIZED schedules the file deletion.
- ``LocalCacheCleanerStats:101-146``: cacheSizeBeforeClean, total /
  public (null user) / private split, per-user breakdown.

Spark-first closed form: the sequential walk is exact as ONE pass
because the stop condition is monotone in the LRU prefix sum — the
same proof as `ramdisk.eviction_plan`: rows that remove() would
accept form a prefix of the candidate order, so an exclusive running
sum of their sizes reproduces ``currentSize - totalDelSize`` at every
row's turn, and inflating the sum past the stop point cannot flip an
already-false comparison. Every window and aggregate shares the node
partition key (the per-user stat only appends a key suffix), so a
100k-node fleet cleans in one shuffle, partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

IN_USE = "IN_USE"
DELETED = "DELETED"
DELETED_NO_FILE = "DELETED_NO_FILE"
STATS_ONLY_ABSENT = "STATS_ONLY_ABSENT"
REMOVE_FAILED = "REMOVE_FAILED"
RETAIN_TARGET_MET = "RETAIN_TARGET_MET"


def clean_cache_plan(resources: DataFrame, targets: DataFrame) -> DataFrame:
    """Plan one cache-cleanup pass per node.

    ``resources``: (node, rsrc_id long, user string NULL=public,
    size long, ts long — last-use timestamp, ref_count int,
    state string in LOCALIZED/INIT/DOWNLOADING/ABSENT).
    ``targets``: (node, target_size long) — the per-NM
    yarn.nodemanager.localizer.cache.target-size-mb equivalent.

    Returns every resource row with its ``action`` plus the node's
    LocalCacheCleanerStats (cache_size_before_clean, total/public/
    private del sizes and the per-user private breakdown)."""
    wn = Window.partitionBy("node")
    cand = F.col("ref_count") == 0
    # remove() returns true for LOCALIZED / INIT / ABSENT — all three
    # count toward the stats and the loop budget; DOWNLOADING fails.
    eff = cand & (F.col("state") != "DOWNLOADING")
    # the exclusive frame is empty on the first row -> NULL, not 0
    prefix = F.coalesce(
        F.sum(F.when(eff, F.col("size")).otherwise(F.lit(0))).over(
            wn.orderBy("ts", "rsrc_id").rowsBetween(
                Window.unboundedPreceding, -1
            )
        ),
        F.lit(0),
    )
    staged = (
        resources.join(F.broadcast(targets), "node")
        .withColumn("cache_size_before_clean", F.sum("size").over(wn))
        .withColumn(
            "__visited",
            cand
            & (
                F.col("cache_size_before_clean") - prefix
                > F.col("target_size")
            ),
        )
        .withColumn("__counted", F.col("__visited") & eff)
    )
    action = (
        F.when(~cand, F.lit(IN_USE))
        .when(
            F.col("__counted") & (F.col("state") == "LOCALIZED"),
            F.lit(DELETED),
        )
        .when(
            F.col("__counted") & (F.col("state") == "INIT"),
            F.lit(DELETED_NO_FILE),
        )
        .when(F.col("__counted"), F.lit(STATS_ONLY_ABSENT))
        .when(F.col("__visited"), F.lit(REMOVE_FAILED))
        .otherwise(F.lit(RETAIN_TARGET_MET))
    )
    del_size = F.when(F.col("__counted"), F.col("size")).otherwise(F.lit(0))
    is_public = F.col("user").isNull()
    wu = Window.partitionBy("node", "user")
    return staged.select(
        "node",
        "rsrc_id",
        "user",
        "size",
        action.alias("action"),
        F.col("cache_size_before_clean").cast("long").alias(
            "cache_size_before_clean"
        ),
        F.sum(del_size).over(wn).cast("long").alias("total_del_size"),
        F.sum(F.when(is_public, del_size).otherwise(F.lit(0)))
        .over(wn)
        .cast("long")
        .alias("public_del_size"),
        F.sum(F.when(~is_public, del_size).otherwise(F.lit(0)))
        .over(wn)
        .cast("long")
        .alias("private_del_size"),
        F.when(~is_public, F.sum(del_size).over(wu))
        .cast("long")
        .alias("user_del_size"),
    )
