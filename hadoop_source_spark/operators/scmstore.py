"""SharedCacheManager store bootstrap + cleaner sweep: how the YARN
shared cache decides which uploaded resources survive.

Reference semantics:

- Bootstrap (`InMemorySCMStore.getInitialCachedResources:187-243`):
  glob every FILE one level below the nested checksum directories;
  the immediate parent directory name is the resource key; only the
  FIRST file per key is mapped (globStatus returns paths in sorted
  order, later duplicates are warned and dropped).
- Cleaner (`CleanerTask.processSingleResource:196-276`): a directory
  whose name ends with ``-renamed`` is a leftover from a crashed
  delete — remove it outright (status DELETED; a failed delete
  leaves the INIT status the reference logs as invalid). Otherwise
  the directory name is the key: ``cleanResourceReferences``
  (`SCMStore.java:157-173`) first drops references whose app is no
  longer active (NO access-time bump — ``updateAccessTime=false``),
  then ``isResourceEvictable`` (`InMemorySCMStore.java:415-434`):
  never evictable while the bootstrap-time active-app list is
  non-empty; otherwise compare against ``now - stalenessMinutes``:
  a store-resident resource uses its access time, an unknown key
  falls back to ``max(modTime, store start time)`` ("the store
  startup time as the last point of certainty"). An evictable
  resource is removed from the store only when its surviving
  reference set is empty (`removeResource:380-397`; a key absent
  from the store removes trivially), then the directory is renamed
  to ``<dir>-renamed`` and deleted
  (`removeResourceFromCacheFileSystem:278-294`) — DELETED on
  success, ERROR when the rename or delete fails; a resource kept
  alive by references, or not evictable at all, is PROCESSED.

Spark-first: bootstrap is one min-per-key aggregation; the cleaner
is one reference aggregation joined to the resource table plus a
codegen when-chain — two shuffles total regardless of cache size;
the active-app registry broadcasts. ``fs_fault`` is explicit fault
injection standing in for the filesystem failures that produce the
reference's ERROR/INIT statuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RENAMED_SUFFIX = "-renamed"

DELETED = "DELETED"
PROCESSED = "PROCESSED"
ERROR = "ERROR"
INIT = "INIT"


def bootstrap_store(files: DataFrame) -> DataFrame:
    """One store entry per checksum key from a cache-area listing.

    ``files``: (parent_key string — the checksum directory name,
    file_name string, is_file boolean). Directories are skipped
    (``entry.isFile()`` gate :221); the first file in sorted order
    wins per key, the rest are counted as ignored duplicates
    (:228-236).

    Returns (key, file_name, dup_files int). Scale: a single
    min/count aggregation on the key — one shuffle, map-side
    partial aggregation."""
    return (
        files.where(F.col("is_file"))
        .groupBy(F.col("parent_key").alias("key"))
        .agg(
            F.min("file_name").alias("file_name"),
            (F.count(F.lit(1)) - 1).cast("int").alias("dup_files"),
        )
    )


def cleaner_plan(
    resources: DataFrame,
    refs: DataFrame,
    active_apps: DataFrame,
    *,
    staleness_minutes: int,
    start_time: int,
    now_ms: int,
    initial_apps: int,
) -> DataFrame:
    """One cleaner pass over the shared cache area.

    ``resources``: (key, dir_name — may carry the -renamed suffix,
    mod_time long, in_store boolean, access_time long nullable —
    null when not in store, fs_fault string 'none'|'rename'|
    'delete'). ``refs``: (key, app_id) — the store's reference
    sets. ``active_apps``: (app_id) — the app checker's view.

    Returns (key, action, evictable, live_refs, dead_removed,
    last_use); the reference-count and evictability columns are NULL
    on ``-renamed`` rows, which never consult the store (:204-213).
    """
    stale_time = now_ms - staleness_minutes * 60_000

    ref_counts = (
        refs.join(
            F.broadcast(active_apps.withColumn("_active", F.lit(True))),
            "app_id",
            "left",
        )
        .groupBy("key")
        .agg(
            F.sum(
                F.when(F.col("_active").isNotNull(), 1).otherwise(0)
            ).cast("int").alias("_live"),
            F.sum(
                F.when(F.col("_active").isNull(), 1).otherwise(0)
            ).cast("int").alias("_dead"),
        )
    )
    r = resources.join(ref_counts, "key", "left")

    renamed = F.col("dir_name").endswith(RENAMED_SUFFIX)
    live = F.coalesce(F.col("_live"), F.lit(0))
    dead = F.coalesce(F.col("_dead"), F.lit(0))
    last_use = F.when(
        F.col("in_store"), F.col("access_time")
    ).otherwise(F.greatest(F.col("mod_time"), F.lit(start_time)))
    evictable = F.when(F.lit(initial_apps > 0), F.lit(False)).otherwise(
        last_use < stale_time
    )
    removed = ~F.col("in_store") | (live == 0)
    fs_ok = F.col("fs_fault") == "none"

    action = (
        # the renamed branch only deletes — a rename fault cannot
        # touch it (:204-213)
        F.when(
            renamed,
            F.when(F.col("fs_fault") == "delete", INIT).otherwise(DELETED),
        )
        .when(
            evictable & removed,
            F.when(fs_ok, DELETED).otherwise(ERROR),
        )
        .otherwise(PROCESSED)
    )
    return r.select(
        "key",
        action.alias("action"),
        F.when(~renamed, evictable).alias("evictable"),
        F.when(~renamed, live).alias("live_refs"),
        F.when(~renamed, dead).alias("dead_removed"),
        F.when(~renamed, last_use).cast("long").alias("last_use"),
    )
