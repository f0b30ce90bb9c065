"""Datanode volume block scanner: scan-queue planning.

Reference semantics (`hdfs/server/datanode/VolumeScanner.java`): each
volume has one scanner thread that walks its blocks continuously,
re-scanning every block once per `dfs.datanode.scan.period.hours`
(:355-396 — blocks scanned more recently than the period wait for the
next cycle), throttled to `dfs.block.scanner.volume.bytes.per.second`
(:411); blocks reported SUSPECT (read errors seen by clients) jump
the queue (:135-143 `suspectBlocks`, drained first in `runLoop`
:539-554, each scanned at most once per cycle).

Spark-first: the scanner's behavior over the next period is a pure
function of the block table — order each volume's due blocks
(suspects first in report order, then stalest first), accumulate
bytes with a window PARTITIONED BY volume, and divide by the
throttle to get the hour each block reaches the head. One projection
plus per-volume windows; a million-volume fleet plans in one job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scan_queue(
    blocks: DataFrame,
    now: Column,
    scan_period_hours: int = 504,
    bytes_per_sec: int = 1048576,
) -> DataFrame:
    """Queue position + ETA for every due block.

    blocks: volume, block_id, size_bytes, last_scan_ts (null = never
    scanned), suspect (bool), suspect_ts (null unless suspect —
    preserves report order like the reference's LinkedHashSet).
    Blocks scanned within the period and not suspect are dropped
    (they wait this cycle out). Output adds position (per volume),
    bytes_ahead (exact queue depth in bytes — the engine-portable
    number), and eta_hours (bytes_ahead / throttle, derived float)."""
    age_h = (
        F.unix_micros(now) - F.unix_micros(F.col("last_scan_ts"))
    ) / 3.6e9
    due = blocks.filter(
        F.col("suspect")
        | F.col("last_scan_ts").isNull()
        | (age_h >= scan_period_hours)
    )
    order = [
        F.col("suspect").desc(),
        F.col("suspect_ts").asc_nulls_last(),
        F.col("last_scan_ts").asc_nulls_first(),
        F.col("block_id").asc(),
    ]
    w = Window.partitionBy("volume").orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, -1)
    ahead = F.coalesce(F.sum("size_bytes").over(wsum), F.lit(0))
    return due.select(
        "volume",
        "block_id",
        "size_bytes",
        "suspect",
        F.row_number().over(w).alias("position"),
        ahead.alias("bytes_ahead"),
        F.round(ahead / (bytes_per_sec * 3600.0), 4).alias("eta_hours"),
    )
