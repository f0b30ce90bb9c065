"""Centralized cache management planning (reference: hdfs cacheadmin —
CacheManager.java / CachePool.java: admins define cache POOLS with byte
limits and DIRECTIVES (path + replication + pool); the CacheManager
caches matching blocks pool-by-pool until the pool's limit is hit, and
directives that no longer fit stay pending with an 'insufficient quota'
state).

Spark-first shape: directives are a BROADCAST dimension; files match by
prefix (component-boundary equi-join over the bounded ancestor explode,
same kernel as the storage-policy resolver); each matched file charges
size x cache-replication to its pool, and the pool's admission cutoff is
one cumulative-sum window PER POOL in deterministic (directive_id, path)
order — the same serialized-per-pool admission the CacheManager itself
performs. The windows partition by pool, so no global sort exists; a
pool's matched-file list is the unit of ordering exactly as in the
reference."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoop_source_spark.operators.mover import ancestor_prefixes


def cache_plan(
    files: DataFrame,
    directives: DataFrame,
    pools: DataFrame,
    path_col: str = "path",
    size_col: str = "size",
) -> DataFrame:
    """Admission plan for every (directive, file) pair:

    ``files``: (path, size); ``directives``: (directive_id, prefix,
    repl, pool); ``pools``: (pool, limit_bytes). Returns (directive_id,
    path, pool, charge_bytes, cum_bytes, state) with state CACHED while
    the pool's running total stays within its limit, else PENDING —
    CacheDirectiveStats.hasExpired==false + insufficient-quota analog."""
    pref = files.select(
        path_col, size_col,
        F.explode(ancestor_prefixes(path_col)).alias("prefix"),
    )
    matched = pref.join(F.broadcast(directives), "prefix").select(
        "directive_id",
        path_col,
        "pool",
        (F.col(size_col) * F.col("repl")).alias("charge_bytes"),
    )
    w = (
        Window.partitionBy("pool")
        .orderBy("directive_id", path_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        matched.withColumn("cum_bytes", F.sum("charge_bytes").over(w))
        .join(F.broadcast(pools), "pool")
        .select(
            "directive_id",
            path_col,
            "pool",
            "charge_bytes",
            "cum_bytes",
            F.when(F.col("cum_bytes") <= F.col("limit_bytes"), "CACHED")
            .otherwise("PENDING")
            .alias("state"),
        )
    )
