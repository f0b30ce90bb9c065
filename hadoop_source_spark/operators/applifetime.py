"""YARN application lifetime: effective-lifetime resolution, timeout
updates, and the monitor's expiry sweep.

Reference semantics:

- ``CapacityScheduler.checkAndGetApplicationLifetime:3228-3258``: an
  unknown or non-leaf queue passes the requested lifetime through
  unchanged; with no queue maximum (<= 0) a non-positive request
  takes the queue default; otherwise a non-positive request takes
  the default, an over-maximum request is cut to the maximum, and
  anything else stands. (Defaults can't exceed the maximum by config
  validation, so only the maximum is checked.)
- ``RMAppManager.updateApplicationTimeout:671-732``: an app already
  in a completed state ignores the update; a new LIFETIME expiry is
  validated by ``RMServerUtils.validateISO8601AndConvertToLocal
  TimeEpoch:540-566`` — STRICTLY before now rejects (equal-to-now
  passes) — and then cut to submitTime + queueMax*1000 when the
  queue maximum is positive (:690-698).
- ``RMAppLifetimeMonitor.expire:74-96``: a monitored app whose
  expiry has passed is killed; apps with a non-positive effective
  lifetime are never registered.

Spark-first: one broadcast join against the (conf-sized) queue table
plus a codegen when-chain; no shuffles beyond the broadcast."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NOT_MONITORED = "NOT_MONITORED"
MONITORED = "MONITORED"
EXPIRE_KILL = "EXPIRE_KILL"
COMPLETED = "COMPLETED"

UPD_IGNORED_COMPLETED = "IGNORED_COMPLETED"
UPD_REJECTED_PAST = "REJECTED_PAST"
UPD_APPLIED = "APPLIED"
UPD_APPLIED_CAPPED = "APPLIED_CAPPED"


def lifetime_plan(apps: DataFrame, queues: DataFrame, *,
                  now_ms: int) -> DataFrame:
    """``apps``: (app_id, queue, requested_lifetime_sec long,
    submit_time_ms long, completed boolean, update_expire_ms long —
    pending absolute-time update, null when none). ``queues``:
    (queue, is_leaf boolean, default_lifetime_sec long,
    max_lifetime_sec long).

    Returns (app_id, effective_lifetime_sec, update_outcome,
    expire_ms, verdict)."""
    j = apps.join(F.broadcast(queues), "queue", "left")
    req = F.col("requested_lifetime_sec")
    known_leaf = F.col("is_leaf").isNotNull() & F.col("is_leaf")
    eff = (
        F.when(~known_leaf, req)
        .when(
            F.col("max_lifetime_sec") <= 0,
            F.when(req <= 0, F.col("default_lifetime_sec")).otherwise(req),
        )
        .when(req <= 0, F.col("default_lifetime_sec"))
        .when(req > F.col("max_lifetime_sec"), F.col("max_lifetime_sec"))
        .otherwise(req)
    )
    j = j.withColumn("_eff", eff)
    base_expire = F.when(
        F.col("_eff") > 0,
        F.col("submit_time_ms") + F.col("_eff") * 1000,
    )
    upd = F.col("update_expire_ms")
    # Queue max for the cap: unknown/non-leaf queues have none.
    qmax = F.when(known_leaf, F.col("max_lifetime_sec"))
    cap = F.col("submit_time_ms") + qmax * 1000
    upd_capped = F.when(
        (qmax > 0) & (upd > cap), cap
    ).otherwise(upd)
    outcome = F.when(
        upd.isNotNull(),
        F.when(F.col("completed"), UPD_IGNORED_COMPLETED)
        .when(upd < now_ms, UPD_REJECTED_PAST)
        .when((qmax > 0) & (upd > cap), UPD_APPLIED_CAPPED)
        .otherwise(UPD_APPLIED),
    )
    applied = outcome.isin(UPD_APPLIED, UPD_APPLIED_CAPPED)
    expire = F.when(applied, upd_capped).otherwise(base_expire)
    return j.select(
        "app_id",
        F.col("_eff").alias("effective_lifetime_sec"),
        outcome.alias("update_outcome"),
        F.when(~F.col("completed"), expire).alias("expire_ms"),
        F.when(F.col("completed"), COMPLETED)
        .when(expire.isNull(), NOT_MONITORED)
        .when(expire <= now_ms, EXPIRE_KILL)
        .otherwise(MONITORED)
        .alias("verdict"),
    )
