"""RM graceful-decommission tracking: per-node container-drain status
and timeout-aware readiness rollup.

Reference semantics (`hadoop-yarn-server-resourcemanager/.../
DecommissioningNodesWatcher.java`, pinned by
`TestDecommissioningNodesWatcher.java`):

- Only nodes observed in DECOMMISSIONING are tracked
  (``update:139-186``); a node in any other state is dropped from the
  watch map, so its status reads NONE (``checkDecommissioningStatus:
  233-236``). A tracked node later seen DECOMMISSIONED keeps a context
  and reports DECOMMISSIONED (:238-241).
- ``numActiveContainers`` counts container statuses in RUNNING or NEW
  (:163-171); every other container state (COMPLETE, ...) is drained.
- Status decision (:243-256), with waitTime = now -
  decommissioningStartTime and timeoutMs < 0 meaning "no timeout":
    active > 0 -> WAIT_CONTAINER, or TIMEOUT once waitTime >= timeout;
    active == 0 and no running apps -> READY;
    active == 0 but apps still running -> WAIT_APP / TIMEOUT.
  The WAIT_APP branch exists because a completed-container node may
  still serve shuffle data to running apps
  (``testDecommissioningNodesWatcherWithPreviousRunningApps``).
- ``checkReadyToBeDecommissioned:226-230``: READY or TIMEOUT both
  green-light the DECOMMISSION event (the poll task fires it for
  TIMEOUT nodes, ``PollTimerTask.run:303-317``).
- ``lastContainerFinishTime`` latches the first update moment at which
  the active count hit zero (:174-178).

Spark-first: latest container state per (node, container) is one
max_by over the status-update log; app and container counts are
map-side-combined aggregates; the per-node classification is a pure
column expression after two slim joins on node_id. No UDFs, no
windows over the big log beyond the per-key last-state agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NONE = "NONE"
WAIT_CONTAINER = "WAIT_CONTAINER"
WAIT_APP = "WAIT_APP"
TIMEOUT = "TIMEOUT"
READY = "READY"
DECOMMISSIONED = "DECOMMISSIONED"

# ContainerState values that count as still-active (update:166-169).
_ACTIVE_STATES = ("RUNNING", "NEW")


def active_containers(container_statuses: DataFrame) -> DataFrame:
    """Latest-state container drain view per node.

    ``container_statuses``: the status-update log (node_id,
    container_id, state, update_seq) — the reference receives the
    latest ContainerStatus list per heartbeat; the log form models the
    same stream. The LAST state per container (max update_seq) wins;
    a container is active while that state is RUNNING or NEW.

    Returns (node_id, n_active, last_finish_seq) where last_finish_seq
    is the earliest seq by which every container had left the active
    set (the ``lastContainerFinishTime`` latch) — null while any is
    still active."""
    last = container_statuses.groupBy("node_id", "container_id").agg(
        F.max_by("state", "update_seq").alias("state"),
        F.max("update_seq").alias("last_seq"),
    )
    is_active = F.col("state").isin(*_ACTIVE_STATES)
    return last.groupBy("node_id").agg(
        F.sum(F.when(is_active, 1).otherwise(0)).alias("n_active"),
        F.when(
            F.sum(F.when(is_active, 1).otherwise(0)) == 0,
            F.max("last_seq"),
        ).alias("last_finish_seq"),
    )


def decommissioning_status(
    nodes: DataFrame,
    container_statuses: DataFrame,
    running_apps: DataFrame,
    now: int,
) -> DataFrame:
    """Per-node DecommissioningNodeStatus rollup at time ``now``.

    ``nodes``: (node_id, node_state, decom_start_time long,
    timeout_ms long — negative means no timeout). ``running_apps``:
    (node_id, app_id) rows for apps the RM still counts as running on
    the node (``rmNode.getRunningApps``). ``container_statuses``: see
    :func:`active_containers`.

    Returns (node_id, node_state, status, ready boolean, n_active,
    n_apps, wait_ms)."""
    drains = active_containers(container_statuses)
    apps = running_apps.groupBy("node_id").agg(
        F.count_distinct("app_id").alias("n_apps")
    )
    j = (
        nodes.join(drains, "node_id", "left")
        .join(apps, "node_id", "left")
        .withColumn("n_active", F.coalesce("n_active", F.lit(0)))
        .withColumn("n_apps", F.coalesce("n_apps", F.lit(0)))
        .withColumn("wait_ms", F.lit(now) - F.col("decom_start_time"))
    )
    in_time = (F.col("timeout_ms") < 0) | (
        F.col("wait_ms") < F.col("timeout_ms")
    )
    status = (
        F.when(F.col("node_state") == DECOMMISSIONED, DECOMMISSIONED)
        .when(F.col("node_state") != "DECOMMISSIONING", NONE)
        .when(
            F.col("n_active") > 0,
            F.when(in_time, WAIT_CONTAINER).otherwise(TIMEOUT),
        )
        .when(F.col("n_apps") == 0, READY)
        .otherwise(F.when(in_time, WAIT_APP).otherwise(TIMEOUT))
    )
    return j.select(
        "node_id",
        "node_state",
        status.alias("status"),
        status.isin(READY, TIMEOUT).alias("ready"),
        F.col("n_active").cast("long").alias("n_active"),
        F.col("n_apps").cast("long").alias("n_apps"),
        F.col("wait_ms").cast("long").alias("wait_ms"),
    )


def poll_actions(status_df: DataFrame) -> DataFrame:
    """PollTimerTask decision per tracked node (run:276-319): TIMEOUT
    nodes that are ready-to-decommission get a DECOMMISSION event;
    non-DECOMMISSIONING tracked nodes are removed from the watch map;
    everything else is kept. ``status_df`` is
    :func:`decommissioning_status` output."""
    action = (
        F.when(F.col("status") == TIMEOUT, "SEND_DECOMMISSION")
        .when(F.col("status").isin(NONE, DECOMMISSIONED), "REMOVE")
        .otherwise("KEEP")
    )
    return status_df.select("node_id", "status", action.alias("action"))
