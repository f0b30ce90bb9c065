"""YARN ReservationSystem admission: RLE cumulative-capacity interval
algebra.

Reference semantics:
- `resourcemanager/reservation/RLESparseResourceAllocation.java:38-44`
  maintains allocations over time as a run-length-encoded staircase —
  a NavigableMap<time, capacity> where each entry's value holds until
  the next breakpoint; addInterval/removeInterval merge ±(start, cap)
  /(end, 0) fronts into the map (:75,:104).
- `NoOverCommitPolicy.validate` rejects a reservation whose
  allocation, added to the plan's existing committed capacity, would
  exceed the plan's total capacity at ANY instant of its interval
  (ResourceOverCommitException).
- `CapacityOverTimePolicy.java:52-65` further enforces the per-user
  INSTANTANEOUS quota: the user's own allocations plus the new one
  must stay under maxInst × cluster at every instant (the integral
  maxAvg×validWindow check rides the same staircase integrals,
  :124-180).
- `ReservationSystem.java:45` wires these policies into the
  reservation agent that ACCEPTs or REJECTs each submission.

Spark-first: the staircase IS a windowed cumulative sum — explode
each accepted reservation into a +amount front at start and a
−amount front at end, one groupBy collapses simultaneous fronts, one
per-queue window cumsum yields the RLE map (t, load, t_next).
Admission is then an interval-overlap join of requests against the
staircase intervals and a max — batch semantics: every request is
validated against the ACCEPTED plan (exactly `validate(plan, r)`),
not against sibling requests. Reservation plans are per-queue RM
state (control-plane-sized staircases), so the queue-keyed overlap
join broadcasts; at data scale the same plan works with time-bucket
co-keys (the rangejoin binning pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INF = (1 << 62)


def rle_staircase(
    alloc: DataFrame,
    keys: list[str],
    start: str = "start",
    end: str = "end",
    amount: str = "amount",
) -> DataFrame:
    """The RLESparseResourceAllocation map as rows: for each key group,
    (t, load, t_next) — `load` holds on [t, t_next); the final
    breakpoint's load is 0 by construction (every +front has a −front).
    One union + one groupBy + one window cumsum."""
    up = alloc.select(
        *keys, F.col(start).alias("t"), F.col(amount).alias("delta")
    )
    down = alloc.select(
        *keys, F.col(end).alias("t"), (-F.col(amount)).alias("delta")
    )
    ev = (
        up.unionByName(down)
        .groupBy(*keys, "t")
        .agg(F.sum("delta").alias("__d"))
    )
    w = Window.partitionBy(*keys).orderBy("t")
    return ev.select(
        *keys,
        "t",
        F.sum("__d").over(w).alias("load"),
        F.coalesce(F.lead("t").over(w), F.lit(_INF)).alias("t_next"),
    )


def _peak_over(requests: DataFrame, stair: DataFrame, keys: list[str],
               out_col: str) -> DataFrame:
    """Max staircase load overlapping each request's [start, end) —
    load is constant inside a staircase interval, so clipping is free;
    a request overlapping no interval (empty plan region) peaks at 0."""
    j = requests.join(F.broadcast(stair), on=keys, how="left")
    overlap = (F.col("t") < F.col("end")) & (F.col("t_next") > F.col("start"))
    return (
        j.select(
            *requests.columns,
            F.when(overlap, F.col("load")).alias("__l"),
        )
        .groupBy(*requests.columns)
        .agg(F.coalesce(F.max("__l"), F.lit(0)).alias(out_col))
    )


def reservation_admission(
    requests: DataFrame,
    existing: DataFrame,
    capacities: DataFrame,
    max_inst: float = 1.0,
) -> DataFrame:
    """ACCEPT/REJECT each reservation request against the committed
    plan. requests: (request_id, queue, user, start, end, amount);
    existing: (queue, user, start, end, amount) — the accepted plan;
    capacities: (queue, capacity). Output adds peak_load (plan
    staircase max over the request window), user_peak (the user's own
    staircase max), headroom, accepted, reject_reason
    ('PLAN_CAPACITY' — NoOverCommitPolicy's ResourceOverCommitException
    — checked FIRST, exactly validate()'s order, then
    'USER_INSTANTANEOUS_QUOTA' — CapacityOverTimePolicy maxInst)."""
    plan = rle_staircase(existing, ["queue"])
    user_plan = rle_staircase(existing, ["queue", "user"])
    with_peak = _peak_over(requests, plan, ["queue"], "peak_load")
    with_user = _peak_over(
        with_peak, user_plan, ["queue", "user"], "user_peak"
    )
    j = with_user.join(F.broadcast(capacities), "queue")
    over_cap = F.col("peak_load") + F.col("amount") > F.col("capacity")
    over_user = (
        F.col("user_peak") + F.col("amount")
        > F.col("capacity") * F.lit(max_inst)
    )
    reason = (
        F.when(over_cap, F.lit("PLAN_CAPACITY"))
        .when(over_user, F.lit("USER_INSTANTANEOUS_QUOTA"))
        .otherwise(F.lit(None).cast("string"))
    )
    return j.select(
        "request_id",
        "queue",
        "user",
        "start",
        "end",
        "amount",
        "peak_load",
        "user_peak",
        (F.col("capacity") - F.col("peak_load") - F.col("amount")).alias(
            "headroom"
        ),
        reason.isNull().alias("accepted"),
        reason.alias("reject_reason"),
    )


def integral_quota_check(
    requests: DataFrame,
    existing: DataFrame,
    capacities: DataFrame,
    max_avg: float,
    valid_window: int,
) -> DataFrame:
    """CapacityOverTimePolicy's INTEGRAL quota
    (`CapacityOverTimePolicy.java:95-203`): over any window of length
    `valid_window`, a user's average allocation must stay ≤ maxAvg ×
    cluster capacity. Mirrors the reference construction exactly:

    - toCheck = the user's own committed consumption plus the new
      reservation, clipped to [start − W, end + W] (:95-121 — events
      at/before the range start collapse into an initial level there);
    - intermediate points every W inside long flat segments (:132-146
      — an exact-multiple landing on the next breakpoint is overridden
      by it, so it is skipped here);
    - a running point-wise integral I(t), normalized by ROUNDING
      I/W per point (normalizeToResource :209 — Math.round, half-up
      for the non-negative values involved);
    - an UP staircase at each point t carrying round(I(t)/W) and a
      DOWN staircase at t + W with the same value (:149-167); their
      difference is the staircase sliding-window average the reference
      tests (:172-181);
    - REJECT when that staircase exceeds maxAvg × capacity anywhere in
      the check range (:186-196 subtractTestNonNegative).

    requests/existing/capacities as in `reservation_admission`.
    Output: the request columns + integral_peak (the staircase max),
    integral_limit, integral_ok. Per-request candidate sets are
    user-staircase-sized — the joins broadcast; every window
    partitions by request_id."""
    W = int(valid_window)
    rid_cols = requests.columns
    uev = existing.select(
        "queue", "user", F.col("start").alias("t"),
        F.col("amount").alias("d"),
    ).unionByName(
        existing.select(
            "queue", "user", F.col("end").alias("t"),
            (-F.col("amount")).alias("d"),
        )
    )
    cs = F.col("start") - W
    ce = F.col("end") + W
    j = requests.join(F.broadcast(uev), ["queue", "user"], "left")
    user_pts = (
        j.filter(F.col("t").isNotNull() & (F.col("t") <= ce))
        # events at/before the range start collapse into the initial
        # level AT the range start (the reference's range clipping)
        .select(
            *rid_cols,
            F.greatest(F.col("t"), cs).alias("t"),
            F.col("d"),
        )
    )
    req_pts = requests.select(
        *rid_cols, F.col("start").alias("t"), F.col("amount").alias("d")
    ).unionByName(
        requests.select(
            *rid_cols, F.col("end").alias("t"),
            (-F.col("amount")).alias("d"),
        )
    )
    # ONE exchange for the whole staircase pipeline (r15, guide §2.4):
    # repartition by request_id up front — HashPartitioning(request_id)
    # satisfies every downstream requirement because request_id is in
    # every groupBy key and is every window's partition key — and the
    # two unions below are fused into Generates (explode preserves
    # partitioning where a union discards it). The before-plan paid a
    # fresh exchange per groupBy/window-key change (6+); after, the
    # aggregates and windows all run in the one request_id distribution.
    pts = (
        user_pts.unionByName(req_pts)
        .repartition(F.col("request_id"))
        .groupBy(*rid_cols, "t")
        .agg(F.sum("d").alias("__d"))
    )
    wo = Window.partitionBy("request_id").orderBy("t")
    stepped = pts.select(
        *rid_cols,
        "t",
        F.sum("__d").over(wo).alias("__load"),
        F.lead("t").over(wo).alias("__tn"),
    )
    # intermediate points every W inside a segment, never ON its end —
    # emitted by the SAME Generate that keeps the original point (i=0),
    # replacing the former stepped ∪ inter union
    inter_n = F.when(
        F.col("__tn").isNotNull() & (F.col("__tn") - F.col("t") > W),
        F.floor((F.col("__tn") - F.col("t") - 1) / W).cast("int"),
    ).otherwise(F.lit(0))
    allpts = stepped.select(
        *rid_cols,
        F.explode(F.sequence(F.lit(0), inter_n)).alias("__i"),
        "t",
        "__load",
    ).select(
        *rid_cols,
        (F.col("t") + F.col("__i") * W).alias("t"),
        F.col("__load"),
    )
    w2 = Window.partitionBy("request_id").orderBy("t")
    contrib = allpts.select(
        *rid_cols,
        "t",
        "__load",
        (
            F.coalesce(F.lag("__load").over(w2), F.lit(0))
            * (F.col("t") - F.coalesce(F.lag("t").over(w2), F.col("t")))
        ).alias("__c"),
    )
    integ = contrib.select(
        *rid_cols,
        "t",
        F.round(F.sum("__c").over(
            Window.partitionBy("request_id").orderBy("t")
        ) / W).cast("long").alias("__ri"),
    )
    # up/down staircase fronts from ONE Generate (was a self-union that
    # discarded the request_id partitioning)
    fronts = integ.select(
        *rid_cols,
        F.explode(
            F.array(
                F.struct(
                    F.col("t").alias("t"),
                    F.col("__ri").alias("__up"),
                    F.lit(None).cast("long").alias("__dn"),
                ),
                F.struct(
                    (F.col("t") + W).alias("t"),
                    F.lit(None).cast("long").alias("__up"),
                    F.col("__ri").alias("__dn"),
                ),
            )
        ).alias("__f"),
    ).select(*rid_cols, "__f.t", "__f.__up", "__f.__dn")
    merged = fronts.groupBy(*rid_cols, "t").agg(
        F.max("__up").alias("__up"), F.max("__dn").alias("__dn")
    )
    w3 = (
        Window.partitionBy("request_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stair = merged.select(
        *rid_cols,
        "t",
        (
            F.coalesce(F.last("__up", ignorenulls=True).over(w3), F.lit(0))
            - F.coalesce(
                F.last("__dn", ignorenulls=True).over(w3), F.lit(0)
            )
        ).alias("__avg"),
    )
    peaks = (
        stair.filter(F.col("t") <= ce)
        .groupBy(*rid_cols)
        .agg(F.max("__avg").alias("integral_peak"))
    )
    out = peaks.join(F.broadcast(capacities), "queue")
    limit = (F.col("capacity") * F.lit(max_avg)).cast("long")
    return out.select(
        *rid_cols,
        "integral_peak",
        limit.alias("integral_limit"),
        (F.col("integral_peak") <= limit).alias("integral_ok"),
    )
