"""NM/RM state-store recovery: reconstruct post-restart state from
persisted record logs.

Reference semantics:

NM side (`hadoop-yarn-server-nodemanager/.../recovery/
NMLeveldbStateStoreService.java`):
- A container's persisted state is a set of keys under
  `ContainerManager/containers/<cid>/` (:119-137); recovery folds them
  into one RecoveredContainerState (`loadContainerState:348-440`).
  Status starts REQUESTED; `/queued` upgrades only REQUESTED (:378-380);
  `/paused` overrides REQUESTED/QUEUED/LAUNCHED (:381-386); `/launched`
  overrides REQUESTED/QUEUED/PAUSED; `/exitcode` forces COMPLETED.
  LevelDB iterates key-sorted, so over a key SET the fold is the closed
  precedence exitcode > paused > launched > queued > requested
  (within the sorted suffix order diagnostics < exitcode < killed <
  launched < paused < queued, `paused` is seen after `launched` and
  overrides it; a resumed container has its paused key deleted by
  removeContainerPaused, so presence is authoritative).
- `/killed` marks the killed flag; version/starttime/diagnostics/
  remainingRetryAttempts/workdir/logdir are plain values.
- A container with NO `/request` record is dropped and removed from
  the store during recovery (`getNextRecoveredContainer:328-333`).
- An UNKNOWN key under the container marks it
  RecoveredContainerType.KILL — recovered only to be killed
  (loadContainerState's trailing else; test
  TestNMLeveldbStateStoreService#testUnexpectedKeyDoesntThrowException).

RM side (`hadoop-yarn-server-resourcemanager/.../recovery/
ZKRMStateStore.java`):
- Every mutation is a multi-op that also touches RM_ZK_FENCING_LOCK
  (:219-221; safeSetData/safeCreate/safeDelete at :482-521, 809-959),
  so a fenced-out RM's writes fail atomically: a write survives only
  if its writer holds the CURRENT fence epoch at that zxid.
- App znodes live in a split-index hierarchy: at split index s>0 the
  app id string is split into parent (prefix) + leaf (last s chars)
  and recovery reassembles `appIdStr = parent + leaf`
  (`loadRMAppState:715-752`, `getSplitZnodeParent:780-784`).
- The znode name must equal the stored submission-context app id, else
  recovery throws (`loadRMAppStateFromAppNode:706-710`) — surfaced
  here as a per-app name_ok flag.
- Attempt znodes are children of the app znode and are attached to
  the recovered app (`loadApplicationAttemptState:754-771`); attempts
  of removed apps vanish with the app subtree
  (`removeApplicationStateInternal:1025-1042`).

Scale shape: the NM fold is ONE map-side-combinable groupBy on
container_id. The RM replay joins the write log against the
fence-interval table (failover-count-sized, broadcast) and folds
last-write-wins per znode in one hash partitioning; app↔attempt
attachment is an equi-join on the app path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

REQUESTED = "REQUESTED"
QUEUED = "QUEUED"
LAUNCHED = "LAUNCHED"
PAUSED = "PAUSED"
COMPLETED = "COMPLETED"

RECOVER = "RECOVER"
KILL = "KILL"

_KNOWN_SUFFIXES = (
    "/request", "/version", "/starttime", "/diagnostics", "/launched",
    "/queued", "/paused", "/killed", "/exitcode", "/updateToken",
    "/remainingRetryAttempts", "/restartTimes", "/workdir", "/logdir",
)


def nm_recover_containers(records: DataFrame) -> DataFrame:
    """Fold per-container KV records into recovered container states.

    ``records``: (container_id string, suffix string, value string
    nullable). Returns one row per container holding a /request record:
    (container_id, status, exit_code, killed, version, start_time,
    remaining_retries, recovery_type, n_records); containers without a
    /request record are dropped the way recovery removes them."""
    has = lambda s: F.max(F.when(F.col("suffix") == s, 1)).isNotNull()
    val = lambda s: F.max(F.when(F.col("suffix") == s, F.col("value")))
    agg = records.groupBy("container_id").agg(
        has("/request").alias("_req"),
        has("/queued").alias("_queued"),
        has("/paused").alias("_paused"),
        has("/launched").alias("_launched"),
        has("/killed").alias("killed"),
        val("/exitcode").cast("int").alias("exit_code"),
        F.coalesce(val("/version").cast("int"), F.lit(0)).alias("version"),
        val("/starttime").cast("long").alias("start_time"),
        F.coalesce(
            val("/remainingRetryAttempts").cast("int"), F.lit(-1)
        ).alias("remaining_retries"),
        F.max(
            F.when(~F.col("suffix").isin(*_KNOWN_SUFFIXES), 1)
        ).isNotNull().alias("_unknown"),
        F.count(F.lit(1)).alias("n_records"),
    )
    status = (
        F.when(F.col("exit_code").isNotNull(), COMPLETED)
        .when(F.col("_paused"), PAUSED)
        .when(F.col("_launched"), LAUNCHED)
        .when(F.col("_queued"), QUEUED)
        .otherwise(REQUESTED)
    )
    return (
        agg.where(F.col("_req"))
        .select(
            "container_id",
            status.alias("status"),
            "exit_code",
            "killed",
            "version",
            "start_time",
            "remaining_retries",
            F.when(F.col("_unknown"), KILL).otherwise(RECOVER).alias(
                "recovery_type"
            ),
            "n_records",
        )
    )


def fence_intervals(fences: DataFrame) -> DataFrame:
    """(seq, epoch) fence acquisitions -> half-open validity intervals
    (epoch, seq_from, seq_to). The fence log is failover-count-sized —
    the global window is bounded by RM takeovers, not data."""
    w = Window.orderBy("seq")
    return fences.select(
        "epoch",
        F.col("seq").alias("seq_from"),
        F.coalesce(
            F.lead("seq").over(w), F.lit((1 << 62))
        ).alias("seq_to"),
    )


def rm_apply_fenced_writes(writes: DataFrame, fences: DataFrame) -> DataFrame:
    """Drop writes whose writer did not hold the fence at their zxid
    (the safe multi-op), then fold last-applied-write-wins per znode.

    ``writes``: (seq long, epoch long, path string, op 'PUT'|'DELETE',
    payload string nullable). Returns live znodes: (path, payload,
    seq — the winning write's zxid, epoch)."""
    iv = fence_intervals(fences)
    applied = writes.join(
        F.broadcast(iv),
        (F.col("seq") >= F.col("seq_from"))
        & (F.col("seq") < F.col("seq_to"))
        & (writes["epoch"] == iv["epoch"]),
    ).drop(iv["epoch"]).drop("seq_from", "seq_to")
    last = applied.groupBy("path").agg(
        F.max_by("op", "seq").alias("op"),
        F.max_by("payload", "seq").alias("payload"),
        F.max("seq").alias("seq"),
        F.max_by("epoch", "seq").alias("epoch"),
    )
    return last.where(F.col("op") == "PUT").drop("op")


def rm_recover_apps(
    app_writes: DataFrame, attempt_writes: DataFrame, fences: DataFrame
) -> DataFrame:
    """Reassemble RM application state from fenced znode writes.

    ``app_writes``: (seq, epoch, split_index int, parent string,
    leaf string, op, stored_app_id string — the submission context's
    id, state string). The znode path is parent+leaf per the split
    hierarchy; payload carries stored_app_id|state.
    ``attempt_writes``: (seq, epoch, app_path string, attempt_id int,
    op, final_status string).

    Returns one row per live app: (app_id, split_index, state,
    name_ok, epoch, n_attempts, max_attempt_id, n_failed_attempts)."""
    aw = app_writes.select(
        "seq", "epoch", "op",
        F.concat_ws("/", F.col("split_index").cast("string"),
                    F.col("parent"), F.col("leaf")).alias("path"),
        F.concat_ws(
            "|", F.col("stored_app_id"), F.col("state"),
            F.col("split_index").cast("string"),
            F.concat(F.col("parent"), F.col("leaf")),
        ).alias("payload"),
    )
    live_apps = rm_apply_fenced_writes(aw, fences)
    parts = F.split(F.col("payload"), "\\|")
    apps = live_apps.select(
        F.col("path").alias("app_path"),
        parts.getItem(0).alias("stored_app_id"),
        parts.getItem(1).alias("state"),
        parts.getItem(2).cast("int").alias("split_index"),
        parts.getItem(3).alias("app_id"),
        "epoch",
    ).withColumn("name_ok", F.col("stored_app_id") == F.col("app_id"))
    atw = attempt_writes.select(
        "seq", "epoch", "op",
        F.concat_ws("/", "app_path", F.col("attempt_id").cast("string"))
        .alias("path"),
        F.concat_ws(
            "|", F.col("app_path"), F.col("attempt_id").cast("string"),
            F.col("final_status"),
        ).alias("payload"),
    )
    live_attempts = rm_apply_fenced_writes(atw, fences)
    ap = F.split(F.col("payload"), "\\|")
    att = live_attempts.select(
        ap.getItem(0).alias("app_path"),
        ap.getItem(1).cast("int").alias("attempt_id"),
        ap.getItem(2).alias("final_status"),
    )
    att_roll = att.groupBy("app_path").agg(
        F.count(F.lit(1)).alias("n_attempts"),
        F.max("attempt_id").alias("max_attempt_id"),
        F.sum(
            F.when(F.col("final_status") == "FAILED", 1).otherwise(0)
        ).alias("n_failed_attempts"),
    )
    return (
        apps.join(att_roll, "app_path", "left")
        .select(
            "app_id",
            "split_index",
            "state",
            "name_ok",
            "epoch",
            F.coalesce("n_attempts", F.lit(0)).alias("n_attempts"),
            F.coalesce("max_attempt_id", F.lit(-1)).alias("max_attempt_id"),
            F.coalesce("n_failed_attempts", F.lit(0)).alias(
                "n_failed_attempts"
            ),
        )
    )
