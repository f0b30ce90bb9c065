"""Structured Streaming surface — the inotify/tail analog (SURVEY §2.8)."""

from hadoop_source_spark.streaming.events import (
    dedup_stream,
    events_stream,
    hourly_counts_stream,
    replay_events_to_dir,
    sessionize_stream,
    tail_follow,
)

__all__ = [
    "events_stream",
    "hourly_counts_stream",
    "sessionize_stream",
    "dedup_stream",
    "tail_follow",
    "replay_events_to_dir",
]
