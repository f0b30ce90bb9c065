"""Application History Service: per-app history-file entity merge and
the app/attempt/container generic-history query surface.

Reference semantics (`hadoop-yarn-server-applicationhistoryservice/...
/FileSystemApplicationHistoryStore.java`, pinned by
`TestFileSystemApplicationHistoryStore.java`):

- One history file per application holds a sequence of entries keyed
  by (entity id, suffix ∈ {"_start", "_finish"}) where the entity id
  is the app id, an ``appattempt_...`` id, or a ``container_...`` id
  (:95-103, getApplicationAttempts:224-259, getContainers:373-413).
- Merge is field-group-wise: start entries carry the identity fields
  (name/type/queue/user/submit/start time for apps; host/rpc-port/
  master-container for attempts; resource/node/priority/start time
  for containers) and finish entries the outcome fields (finish time/
  diagnostics/final status/state) — mergeApplicationHistoryData:591-
  608, mergeApplicationAttemptHistoryData:610-627,
  mergeContainerHistoryData:629-643. The reader takes the FIRST entry
  per (entity, suffix) (the read loop stops once both suffixes are
  seen, getApplication:158-186); the writer emits exactly one of
  each.
- An entity with neither suffix present is absent from results
  (:178-180 returns null); one missing suffix only logs a warning —
  the merged row survives with the other group's fields null.

Spark-first: first-entry-per-(entity, suffix) is one min_by
aggregate; the start/finish field groups then pivot into one row per
entity via a conditional-aggregation groupBy on entity_id — two
map-side-combinable aggregations on the same key, no self-join. The
app rollup reuses the merged frame with a second slim aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

START = "start"
FINISH = "finish"

APPLICATION = "application"
ATTEMPT = "appattempt"
CONTAINER = "container"


def merge_history_entries(entries: DataFrame) -> DataFrame:
    """Merged history row per entity.

    ``entries``: (app_id, entity_type ∈ {application, appattempt,
    container}, entity_id, suffix ∈ {start, finish}, seq long — write
    order, and the payload columns: name, user, queue, host, node,
    diagnostics, final_status, state, start_time long, finish_time
    long, exit_status int).

    Returns (app_id, entity_type, entity_id, has_start, has_finish,
    name, user, queue, host, node, start_time, finish_time,
    diagnostics, final_status, state, exit_status) with start-group
    fields taken from the first start entry and finish-group fields
    from the first finish entry."""
    first = entries.groupBy(
        "app_id", "entity_type", "entity_id", "suffix"
    ).agg(
        F.min_by(
            F.struct(
                "name", "user", "queue", "host", "node", "diagnostics",
                "final_status", "state", "start_time", "finish_time",
                "exit_status",
            ),
            "seq",
        ).alias("p")
    )
    is_start = F.col("suffix") == START
    is_finish = F.col("suffix") == FINISH

    def grp(cond, field):
        return F.max(F.when(cond, F.col(f"p.{field}")))

    return first.groupBy("app_id", "entity_type", "entity_id").agg(
        F.max(is_start).alias("has_start"),
        F.max(is_finish).alias("has_finish"),
        grp(is_start, "name").alias("name"),
        grp(is_start, "user").alias("user"),
        grp(is_start, "queue").alias("queue"),
        grp(is_start, "host").alias("host"),
        grp(is_start, "node").alias("node"),
        grp(is_start, "start_time").alias("start_time"),
        grp(is_finish, "finish_time").alias("finish_time"),
        grp(is_finish, "diagnostics").alias("diagnostics"),
        grp(is_finish, "final_status").alias("final_status"),
        grp(is_finish, "state").alias("state"),
        grp(is_finish, "exit_status").alias("exit_status"),
    )


def app_history_rollup(merged: DataFrame) -> DataFrame:
    """getAllApplications-style per-app rollup over
    :func:`merge_history_entries` output: app identity fields joined
    with attempt/container counts and outcome tallies.

    Returns (app_id, name, user, queue, final_status, start_time,
    finish_time, elapsed_ms, n_attempts, n_containers,
    n_finished_containers, n_failed_containers, complete boolean)."""
    apps = merged.where(F.col("entity_type") == APPLICATION).select(
        "app_id", "name", "user", "queue", "final_status",
        "start_time", "finish_time", "has_start", "has_finish",
    )
    children = merged.where(F.col("entity_type") != APPLICATION)
    counts = children.groupBy("app_id").agg(
        F.sum(
            F.when(F.col("entity_type") == ATTEMPT, 1).otherwise(0)
        ).alias("n_attempts"),
        F.sum(
            F.when(F.col("entity_type") == CONTAINER, 1).otherwise(0)
        ).alias("n_containers"),
        F.sum(
            F.when(
                (F.col("entity_type") == CONTAINER) & F.col("has_finish"),
                1,
            ).otherwise(0)
        ).alias("n_finished_containers"),
        F.sum(
            F.when(
                (F.col("entity_type") == CONTAINER)
                & (F.coalesce(F.col("exit_status"), F.lit(0)) != 0),
                1,
            ).otherwise(0)
        ).alias("n_failed_containers"),
    )
    j = apps.join(counts, "app_id", "left")
    zero = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    return j.select(
        "app_id", "name", "user", "queue", "final_status",
        "start_time", "finish_time",
        F.when(
            F.col("has_start") & F.col("has_finish"),
            F.col("finish_time") - F.col("start_time"),
        ).alias("elapsed_ms"),
        zero("n_attempts").alias("n_attempts"),
        zero("n_containers").alias("n_containers"),
        zero("n_finished_containers").alias("n_finished_containers"),
        zero("n_failed_containers").alias("n_failed_containers"),
        (F.col("has_start") & F.col("has_finish")).alias("complete"),
    )
