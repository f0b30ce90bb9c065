"""LAZY_PERSIST RAM-disk eviction planning: which transient replicas
the LazyWriter evicts, in LRU order, to restore free memory.

Reference semantics:
- `fsdataset/impl/RamDiskReplicaLruTracker.java:66-200` — eviction
  candidates are PERSISTED replicas only (a replica enters the
  eviction multimap when its lazy-persist to disk completes,
  recordEndLazyPersist; un-persisted replicas sit in the
  replicasNotPersisted queue and are never evicted), ordered by
  lastUsedTime ascending with ties on the replica key (TreeMultimap
  value order = bpid, blockId). Entries whose replica no longer
  exists are skipped without consuming anything (getNextCandidate
  ForEviction's stale-entry GC).
- `fsdataset/impl/FsDatasetImpl.java:3226-3276 (evictBlocks)` — the
  LazyWriter evicts candidates while free cache (capacity - used)
  stays below bytesNeeded, capped at
  MAX_BLOCK_EVICTIONS_PER_ITERATION = 3 per iteration
  (`FsDatasetImpl.java:262`); each eviction releases the replica's
  bytes. Metrics count evictions whose replica was never read
  (numReads == 0 -> RamDiskBlocksEvictedWithoutRead).

Spark-first scale shape: per-node LRU rank + exclusive running-sum
window over one (node)-partitioned shuffle; the stop condition
"free >= bytesNeeded" is monotone in the prefix sum, so the
sequential loop is a closed-form predicate per row — every DataNode
plans in parallel, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_BLOCK_EVICTIONS_PER_ITERATION = 3  # FsDatasetImpl.java:262


def eviction_plan(
    replicas: DataFrame,
    nodes: DataFrame,
    bytes_needed: int,
    max_evictions: int = MAX_BLOCK_EVICTIONS_PER_ITERATION,
) -> DataFrame:
    """Plan one evictBlocks(bytesNeeded) pass per node.

    `replicas`: (node, block_id long, persisted bool, deleted bool,
    last_used_time long, num_reads long, size_bytes long);
    `nodes`: (node, cache_capacity long, cache_used long).
    Returns every replica with status EVICT / RETAIN (candidate kept)
    / PENDING_PERSIST (not yet persisted — never evictable) / STALE
    (deleted entry, GC'd by the candidate iterator), the LRU rank for
    candidates, and the evicted-without-read metric flag."""
    candidate = F.col("persisted") & ~F.col("deleted")
    lru = Window.partitionBy("node").orderBy(
        F.col("last_used_time").asc(), F.col("block_id").asc()
    )
    r = (
        replicas.join(F.broadcast(nodes), "node")
        .withColumn(
            "__rank",
            F.when(
                candidate,
                F.row_number().over(
                    Window.partitionBy("node", candidate.cast("int")).orderBy(
                        F.col("last_used_time").asc(),
                        F.col("block_id").asc(),
                    )
                ),
            ),
        )
    )
    # exclusive prefix sum of candidate sizes in LRU order: bytes
    # already freed when this candidate comes up
    freed_before = F.coalesce(
        F.sum(F.when(candidate, F.col("size_bytes"))).over(
            lru.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    free_before = (
        F.col("cache_capacity") - F.col("cache_used") + freed_before
    )
    evict = (
        candidate
        & (F.col("__rank") <= max_evictions)
        & (free_before < F.lit(bytes_needed))
    )
    status = (
        F.when(F.col("deleted"), F.lit("STALE"))
        .when(~F.col("persisted"), F.lit("PENDING_PERSIST"))
        .when(evict, F.lit("EVICT"))
        .otherwise(F.lit("RETAIN"))
    )
    return r.select(
        "node",
        "block_id",
        status.alias("status"),
        F.col("__rank").cast("int").alias("lru_rank"),
        (evict & (F.col("num_reads") == 0)).alias("evicted_without_read"),
    )
