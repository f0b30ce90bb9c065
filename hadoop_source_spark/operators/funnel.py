"""Ordered-funnel analysis over an event stream — the multi-step
conversion operator (view → click → purchase) of event analytics
engines; the reference's closest surface is the timeline service's
per-entity event lists (ApplicationTimelineStore), which this answers
in one pass instead of per-entity reads.

Semantics: a user completes step i iff they have an event of step i's
type STRICTLY AFTER their completion time of step i-1, where each
completion time is the EARLIEST qualifying event (first-touch funnel).
No horizon by default — add a predicate on the input for windowed
funnels.

Scale shape: ONE shuffle. All step times are unordered-window
aggregates over the user partition (chained MIN-CASE expressions, each
referencing the previous step's column — consecutive Window operators
share the single partitioning exchange, no sort needed), followed by a
per-user distinct and a global 3-value stack. The alternative
step-per-join formulation (the SQL oracle) re-shuffles per step; this
plan touches the events once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ordered_funnel(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(step, n_users, conv_rate) — one row per funnel step, counts of
    users whose earliest qualifying chain reaches the step; conv_rate
    is relative to step 1."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col)
    prev = None
    tcols = []
    for i, step in enumerate(steps):
        tcol = f"__t{i}"
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        df = df.withColumn(tcol, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = tcol
        tcols.append(tcol)
    per_user = df.select(user_col, *tcols).distinct()
    counts = per_user.agg(
        *[F.count(F.col(c)).cast("long").alias(f"__n{i}") for i, c in enumerate(tcols)]
    )
    stack_args = ", ".join(
        f"'{'>'.join(steps[: i + 1])}', __n{i}" for i in range(len(steps))
    )
    return counts.select(
        F.expr(f"stack({len(steps)}, {stack_args}) as (step, n_users)"),
        F.col("__n0").alias("__base"),
    ).select(
        "step",
        "n_users",
        F.round(F.col("n_users") / F.col("__base"), 4).alias("conv_rate"),
    )
