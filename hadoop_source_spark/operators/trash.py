"""Trash checkpoint / expunge planning.

Reference semantics (`common/fs/TrashPolicyDefault.java`): deleted
paths land under `<trashRoot>/Current` (`moveToTrash`, :123-146);
`createCheckpoint` renames Current to a `yyMMddHHmmss` timestamp dir
(:65 CHECKPOINT format); `deleteCheckpoint` (:224) walks every trash
root, parses each checkpoint dir name back to a time, and deletes
those older than `fs.trash.interval` — names that don't parse are
left alone with a warning rather than deleted (safety first).

Spark-first: the whole sweep is ONE conditional aggregation over the
trash listing — group by (user, dir), parse the dir name once per
group, emit the action and the reclaimable bytes. Per-user trash
roots are just a grouping column; a fleet-wide expunge over millions
of users is the same single groupBy."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHECKPOINT_FMT = "yyMMddHHmmss"


def expunge_plan(
    listing: DataFrame,
    now: Column,
    deletion_interval_hours: float,
    user_col: str = "user",
    dir_col: str = "dir",
    size_col: str = "size",
) -> DataFrame:
    """Per (user, trash dir): action + reclaim stats.

    `dir` is 'Current' or a yyMMddHHmmss checkpoint name. Actions:
    CHECKPOINT (Current becomes a new checkpoint — deleteCheckpoint
    runs createCheckpoint for roots with a Current, :229), DELETE
    (checkpoint older than the interval), KEEP (younger), SKIP_BAD
    (unparseable name — never deleted, TrashPolicyDefault logs and
    continues). Emits n_files, bytes, age_hours (null for Current /
    bad names)."""
    grouped = listing.groupBy(
        F.col(user_col).alias("user"), F.col(dir_col).alias("dir")
    ).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(size_col).alias("bytes"),
        F.first(now).alias("__now"),
    )
    # try_: 'Current' and malformed names must yield null, not an
    # ANSI-mode parse error
    cp_ts = F.try_to_timestamp(F.col("dir"), F.lit(CHECKPOINT_FMT))
    # microsecond precision: unix_timestamp would TRUNCATE to seconds
    # and disagree with any sub-second-aware engine in the last digit
    age_h = (F.unix_micros("__now") - F.unix_micros(cp_ts)) / 3.6e9
    action = (
        F.when(F.col("dir") == "Current", F.lit("CHECKPOINT"))
        .when(cp_ts.isNull(), F.lit("SKIP_BAD"))
        .when(age_h >= deletion_interval_hours, F.lit("DELETE"))
        .otherwise(F.lit("KEEP"))
    )
    return grouped.select(
        "user",
        "dir",
        "n_files",
        "bytes",
        action.alias("action"),
        F.round(age_h, 4).alias("age_hours"),
        F.when(action == "DELETE", F.col("bytes"))
        .otherwise(F.lit(0))
        .alias("reclaimed_bytes"),
    )
