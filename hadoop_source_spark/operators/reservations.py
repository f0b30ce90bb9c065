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
