"""Router-based federation: NameNode membership quorum and RPC
target ordering across router registrations.

Reference semantics (`hadoop-hdfs-rbf/.../federation/`):

- ``MembershipStoreImpl.getRepresentativeQuorum:276-312``: router
  registrations for one (nameservice, namenode) are collated per
  service state into ``TreeSet``s under the natural BaseRecord order
  — DESCENDING dateModified with ``compareTo == 0`` on equal dates
  (``BaseRecord.compareTo:205-211``), so records sharing a
  dateModified COLLAPSE and a state's group size counts DISTINCT
  modification dates, while the quorum threshold ``size >
  records.size() / 2`` (:302) divides by the RAW record count. A
  quorum group answers with its newest record; otherwise the overall
  newest record wins.
- Largest-group ties iterate a ``HashMap`` (:295-299 with strict
  ``<``), i.e. hash order — unspecified. The engine pins the tie
  deterministically: larger distinct-date count first, then the
  group holding the newer newest-record, then the smaller state
  ordinal; equal-date winners inside a set (reference: TreeSet
  insertion order, also unspecified) pin to the smaller state
  ordinal / router id. Kinds and quorum verdicts match the
  reference; only the unspecified tie representative is pinned.
- ``MembershipNamenodeResolver.getRecentRegistrationForQuery:
  352-383``: EXPIRED registrations are dropped (and UNAVAILABLE
  unless requested), then ``NamenodePriorityComparator`` sorts by
  the enum ordinal ACTIVE < OBSERVER < STANDBY < UNAVAILABLE <
  EXPIRED < DISABLED and, within a state, newest dateModified first
  (``NamenodePriorityComparator:40-66``).

Spark-first: one shuffle keyed (nameservice, namenode) computes the
distinct-date group sizes and both newest-record reductions with
max_by; the priority ranking is a single window over the
representative rows. Linear in registrations; no kernels, no
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STATE_ORDINAL = {
    "ACTIVE": 0, "OBSERVER": 1, "STANDBY": 2, "UNAVAILABLE": 3,
    "EXPIRED": 4, "DISABLED": 5,
}


def _ordinal(col):
    m = F.map_from_arrays(
        F.array(*[F.lit(s) for s in STATE_ORDINAL]),
        F.array(*[F.lit(i) for i in STATE_ORDINAL.values()]),
    )
    return m[col]


def representative_registrations(registrations: DataFrame) -> DataFrame:
    """Per-(nameservice, namenode) representative record.

    ``registrations``: (router_id, nameservice, namenode_id, state,
    date_modified long) — one row per reporting router.

    Returns (nameservice, namenode_id, rep_state, rep_router,
    rep_date, quorum boolean)."""
    # Equal-date records inside one (ns, nn, state) collapse
    # (TreeSet natural-order dedup); the surviving record for a date
    # pins to the smallest router id.
    dedup = registrations.groupBy(
        "nameservice", "namenode_id", "state", "date_modified"
    ).agg(F.min("router_id").alias("router_id"))
    groups = dedup.groupBy("nameservice", "namenode_id", "state").agg(
        F.count(F.lit(1)).alias("grp_size"),
        F.max("date_modified").alias("newest_date"),
        F.max_by("router_id", "date_modified").alias("newest_router"),
    )
    raw_n = registrations.groupBy("nameservice", "namenode_id").agg(
        F.count(F.lit(1)).alias("raw_n")
    )
    # Pinned largest-group order: size desc, newest desc, ordinal asc.
    pick = groups.groupBy("nameservice", "namenode_id").agg(
        F.max_by(
            F.struct("state", "grp_size", "newest_date", "newest_router"),
            F.struct(
                F.col("grp_size"),
                F.col("newest_date"),
                -_ordinal(F.col("state")),
            ),
        ).alias("largest"),
        F.max_by(
            F.struct("state", "newest_date", "newest_router"),
            F.struct(F.col("newest_date"), -_ordinal(F.col("state"))),
        ).alias("newest"),
    )
    return pick.join(raw_n, ["nameservice", "namenode_id"]).select(
        "nameservice", "namenode_id",
        (F.col("largest.grp_size") > F.col("raw_n") / 2).alias("quorum"),
        F.when(
            F.col("largest.grp_size") > F.col("raw_n") / 2,
            F.col("largest.state"),
        ).otherwise(F.col("newest.state")).alias("rep_state"),
        F.when(
            F.col("largest.grp_size") > F.col("raw_n") / 2,
            F.col("largest.newest_router"),
        ).otherwise(F.col("newest.newest_router")).alias("rep_router"),
        F.when(
            F.col("largest.grp_size") > F.col("raw_n") / 2,
            F.col("largest.newest_date"),
        ).otherwise(F.col("newest.newest_date")).alias("rep_date"),
    )


ENTER = "ENTER_SAFEMODE"
LEAVE = "LEAVE_SAFEMODE"
STARTUP_DELAY = "STARTUP_DELAY"
REMAIN_STALE = "REMAIN_SAFEMODE_STALE"
REMAIN_MANUAL = "REMAIN_SAFEMODE_MANUAL"
NORMAL = "NORMAL"


def router_safemode_plan(routers: DataFrame, *, startup_interval_ms: int,
                         stale_interval_ms: int, now_ms: int) -> DataFrame:
    """One safemode-service tick per router
    (``RouterSafemodeService.periodicInvoke:163-187``): within the
    startup extension nothing happens (the router started IN
    safemode, ``serviceInit:157``); a stale State Store cache
    (now - cacheUpdateTime > staleInterval) enters safemode unless
    already in it; a fresh cache leaves safemode ONLY when it was
    not set manually (``dfsrouteradmin -safemode enter`` sticks,
    :181-184), recording the time spent in safemode (``leave:
    118-130``).

    ``routers``: (router_id, startup_time_ms, cache_update_time_ms,
    safe_mode boolean, manual boolean, enter_time_ms). Returns
    (router_id, action, safe_mode_after, safemode_time_ms — only on
    leave)."""
    delta = F.lit(now_ms) - F.col("startup_time_ms")
    stale = (
        F.lit(now_ms) - F.col("cache_update_time_ms")
    ) > stale_interval_ms
    action = (
        F.when(delta < startup_interval_ms, STARTUP_DELAY)
        .when(stale & ~F.col("safe_mode"), ENTER)
        .when(stale, REMAIN_STALE)
        .when(F.col("safe_mode") & ~F.col("manual"), LEAVE)
        .when(F.col("safe_mode"), REMAIN_MANUAL)
        .otherwise(NORMAL)
    )
    return routers.select(
        "router_id",
        action.alias("action"),
        F.when(action == ENTER, True)
        .when(action == LEAVE, False)
        .otherwise(F.col("safe_mode"))
        .alias("safe_mode_after"),
        F.when(
            action == LEAVE, F.lit(now_ms) - F.col("enter_time_ms")
        ).alias("safemode_time_ms"),
    )


def namenode_priority(representatives: DataFrame, *,
                      show_unavailable: bool = True) -> DataFrame:
    """RPC target order per nameservice over representative rows
    (ns, nn, rep_state, rep_date): EXPIRED dropped, UNAVAILABLE
    dropped unless requested, then ACTIVE-first state priority with
    newest-date tie-break. Returns (nameservice, namenode_id,
    rep_state, priority int — 1 is first target)."""
    df = representatives.where(F.col("rep_state") != "EXPIRED")
    if not show_unavailable:
        df = df.where(F.col("rep_state") != "UNAVAILABLE")
    w = Window.partitionBy("nameservice").orderBy(
        _ordinal(F.col("rep_state")).asc(),
        F.col("rep_date").desc(),
        F.col("namenode_id").asc(),
    )
    return df.select(
        "nameservice", "namenode_id", "rep_state",
        F.row_number().over(w).cast("int").alias("priority"),
    )
