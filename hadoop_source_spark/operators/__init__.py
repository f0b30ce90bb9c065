"""Relational operator surface.

Modules:
    asof       — as-of join (MapFile.getClosest semantics, MapFile.java:699)
    setops     — snapshot diff (SnapshotDiffReport.java:44-48), set algebra
    relational — top-k, sorted merge, content-summary rollups, quantiles
    kv         — KV-table ops modeled on SequenceFile/MapFile/SetFile
"""

from hadoop_source_spark.operators.asof import asof_join
from hadoop_source_spark.operators.relational import (
    content_summary,
    merge_sorted,
    top_k,
)
from hadoop_source_spark.operators.setops import snapshot_diff

__all__ = [
    "asof_join",
    "snapshot_diff",
    "top_k",
    "merge_sorted",
    "content_summary",
]
