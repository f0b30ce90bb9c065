"""ATSv2 flow-activity table: the daily active-flows surface that flow
queries enter through — (cluster, day, user, flow) rows whose cells
are the run ids active that day, newest day first.

Reference semantics:

- Writer (`hadoop-yarn-server-timelineservice-hbase-client/.../
  HBaseTimelineWriterImpl.java:302-349`): every application
  created/finished event puts one cell at row key (clusterId,
  topOfTheDayTimestamp(eventTs), userId, flowName) with column
  RUN_ID:<runId> and value = the flow VERSION string; HBase keeps the
  newest write per cell, so a run re-written the same day carries the
  latest version. ``getTopOfTheDayTimestamp`` truncates to the UTC
  day (`HBaseTimelineSchemaUtils.java:120-124`: ``ts - ts % 86400000``).
- Row-key order (`flow/FlowActivityRowKey.java:164-186`): the day
  timestamp is INVERTED in the key, so a scan returns newest days
  first, then (user, flow) ascending within a day.
- Reader (`.../reader/FlowActivityEntityReader.java:102-190`): scans
  the cluster prefix bounded by the created-time range
  [begin, end] on the day timestamp, applies a PageFilter of
  ``limit`` ACTIVITY rows, and emits one FlowActivityEntity per row
  carrying a FlowRunEntity per RUN_ID cell (run id + version,
  `parseEntity:157-190`).

Spark-first: the cell-overwrite dedup is one ``max_by`` hash
aggregate on the cell grain; the page scan is a TakeOrderedAndProject
top-k on the activity grain (never a global sort) joined back to the
run cells — run metrics from the flow-run table
(operators/flowrun.py) compose through an ordinary join on the run,
exactly how the reference's two readers share the flow context.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DAY_MS = 86_400_000


def day_ts(ts_col):
    """HBaseTimelineSchemaUtils.getTopOfTheDayTimestamp:120-124."""
    return (ts_col - ts_col % DAY_MS).cast("long")


def flow_activity_table(events: DataFrame) -> DataFrame:
    """Fold app-lifecycle writes into the activity cell grain.

    ``events``: (cluster string, event_ts long, user_id string,
    flow_name string, run_id long, version string, write_ts long —
    the HBase cell timestamp deciding overwrites).

    Returns one row per live cell: (cluster, day_ts, user_id,
    flow_name, run_id, version = the newest write's version)."""
    return (
        events.select(
            "cluster",
            day_ts(F.col("event_ts")).alias("day_ts"),
            "user_id", "flow_name", "run_id", "version", "write_ts",
        )
        .groupBy("cluster", "day_ts", "user_id", "flow_name", "run_id")
        .agg(F.max_by("version", "write_ts").alias("version"))
    )


def flow_activity_scan(
    cells: DataFrame,
    *,
    cluster: str,
    created_begin: int = 0,
    created_end: int | None = None,
    limit: int = 100,
) -> DataFrame:
    """The FlowActivityEntityReader page scan: newest ``limit``
    activity rows of ``cluster`` within the created-time day range,
    with their run cells.

    Returns (day_ts, user_id, flow_name, run_id, version, activity_rank
    — 1-based position in the inverted-rowkey scan order)."""
    c = cells.where(F.col("cluster") == cluster)
    if created_begin > 0:
        c = c.where(F.col("day_ts") >= created_begin)
    if created_end is not None:
        c = c.where(F.col("day_ts") <= created_end)
    # PageFilter counts ACTIVITY rows; rank them via top-k (Take-
    # OrderedAndProject — bounded by the page size, never a global
    # sort) and join the run cells back. The rank window runs AFTER
    # the limit, over at most `limit` (page-size) rows — bounded, the
    # same class as the top-k output itself.
    acts = (
        c.select("day_ts", "user_id", "flow_name")
        .distinct()
        .orderBy(F.col("day_ts").desc(), "user_id", "flow_name")
        .limit(limit)
        .select(
            "day_ts", "user_id", "flow_name",
            F.row_number()
            .over(
                Window.orderBy(
                    F.col("day_ts").desc(), "user_id", "flow_name"
                )
            )
            .alias("activity_rank"),
        )
    )
    return c.join(
        F.broadcast(acts), ["day_ts", "user_id", "flow_name"]
    ).select(
        "day_ts", "user_id", "flow_name", "run_id", "version",
        "activity_rank",
    )
