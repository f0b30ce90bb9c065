"""As-of join — the one genuinely custom operator the reference implies.

Reference semantics: ``MapFile.Reader.getClosest(key, val, before)``
(common/io/MapFile.java:699,715) returns the first entry >= key, or with
``before=True`` the last entry <= key. Joining a probe table against a
sorted build table under those semantics is an as-of join. ``nearest``
and ``tolerance`` complete the pandas ``merge_asof`` surface on top of
the same kernel (getClosest in both directions, keep the closer).

Spark-first design (scales to 100 TB):
We do NOT use a range join (O(n*m) worst case, nested-loop physical plan).
Instead: union probe and build rows, hash-partition by the equi-key, sort
within partitions by (ordering key, side), and carry the nearest build
row's payload STRUCT across the probe rows with
``last/first(..., ignorenulls=True)`` over unbounded one-sided windows.
Cost = ONE shuffle of (probe + build), same as any equi-join, and the
window runs inside the sorted partition — no cross product, no skew
amplification beyond what the equi-key itself has (AQE skew handling
still applies to the exchange). ``nearest`` adds a second window pass
over the SAME sort — still one shuffle.

Direction:
    backward (before=True analog): match the last build row with
        on_right <= on_left  (inclusive).
    forward  (before=False / getClosest default): match the first build row
        with on_right >= on_left (inclusive).
    nearest: whichever of the two is closer; ties go backward (pandas
        merge_asof tie rule).
Tolerance: a maximum |on_left - on_right| for a match — pass a number for
numeric keys or an interval Column (``F.expr("INTERVAL 30 MINUTES")``)
for timestamps; out-of-tolerance matches become null (how='left') or are
dropped (how='inner').
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] | str | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    how: str = "inner",
    tolerance: Column | int | float | None = None,
    build_tiebreak: str | None = None,
) -> DataFrame:
    """Join each left row to the nearest right row by ``on`` within ``by``.

    Columns of ``right`` (other than the by-keys) come back suffixed when
    they collide with a left column; the matched right ordering value is
    always exposed as ``{on}{suffix}``.

    how='inner' drops left rows with no match; how='left' keeps them with
    nulls (getClosest returns null before the first key).

    ``build_tiebreak`` names a build-side column that deterministically
    resolves DUPLICATE build keys (same by-keys and same ``on``): the row
    with the MINIMUM tiebreak value wins. Without it, callers must
    pre-aggregate the build side to one row per key — an extra exchange
    that this parameter folds into the union sort (the tiebreak column
    is appended descending, so the carried `last` build row at equal
    ``on`` is the minimum). backward/forward only: `nearest` carries two
    frames over one sort and a shared tiebreak direction cannot serve
    both, so pre-aggregate for nearest.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction}"
        )
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    if build_tiebreak is not None and direction == "nearest":
        raise ValueError(
            "build_tiebreak is not supported for direction='nearest' — "
            "pre-aggregate the build side instead"
        )
    by_cols = [by] if isinstance(by, str) else list(by or [])
    tol = (
        F.lit(tolerance)
        if tolerance is not None and not isinstance(tolerance, Column)
        else tolerance
    )

    # Disambiguate every non-key right column.
    left_names = set(left.columns)
    val_cols = [c for c in right.columns if c not in by_cols]
    renamed = {}
    for c in val_cols:
        out = c + suffix if (c in left_names or c == on) else c
        renamed[c] = out

    # A build row with a null ordering key can never be "the closest entry"
    # (MapFile keys are total-ordered and non-null); dropping them up front
    # also stops the ignorenulls carry from pairing probe rows with their
    # payload while {on}{suffix} stays null.
    r = right.filter(F.col(on).isNotNull()).select(
        *[F.col(c) for c in by_cols],
        *[F.col(c).alias(renamed[c]) for c in val_cols],
        F.lit(0).alias("__side"),
    )
    l = left.select(
        "*",
        F.lit(1).alias("__side"),
        *[
            F.lit(None).cast(r.schema[renamed[c]].dataType).alias(renamed[c])
            for c in val_cols
        ],
    )
    on_r = renamed[on]

    # Align the union column order explicitly.
    l_cols = by_cols + [on] + [
        c for c in left.columns if c not in by_cols and c != on
    ]
    unioned = l.select(
        *l_cols, "__side", *[renamed[c] for c in val_cols]
    ).unionByName(
        r.select(
            *by_cols,
            F.col(on_r).alias(on),
            *[
                F.lit(None).cast(l.schema[c].dataType).alias(c)
                for c in l_cols
                if c not in by_cols and c != on
            ],
            "__side",
            *[renamed[c] for c in val_cols],
        )
    )
    # Build rows carry their whole payload as ONE struct (one window
    # expression per direction, not one per column).
    payload = F.when(
        F.col("__side") == 0, F.struct(*[renamed[c] for c in val_cols])
    )

    # Null probe keys sort FIRST in both directions: nothing precedes them
    # in the frame, so they match no build row (NULL out / dropped by
    # how='inner') instead of accidentally pairing with the min/max key.
    # The tiebreak column sorts DESCENDING after __side: at equal `on`,
    # the `last`-carried build row is then the minimum tiebreak value
    # (probe rows hold NULL there — desc puts nulls last, but __side
    # already separates the sides, so probe ordering is unaffected).
    tie = (
        [F.col(renamed[build_tiebreak]).desc()]
        if build_tiebreak is not None
        else []
    )
    asc = [F.col(on).asc_nulls_first(), F.col("__side").asc()] + tie
    desc = [F.col(on).desc_nulls_first(), F.col("__side").asc()] + tie
    preceding = (Window.unboundedPreceding, Window.currentRow)
    following = (Window.currentRow, Window.unboundedFollowing)

    def frame(order, bounds):
        return (
            Window.partitionBy(*by_cols).orderBy(*order).rowsBetween(*bounds)
        )

    def diff_back(m):
        return F.col(on) - m[on_r]

    def diff_fwd(m):
        return m[on_r] - F.col(on)

    if direction == "backward":
        # build rows sort before probe rows at equal `on` → inclusive match
        carried = unioned.select(
            "*", F.last(payload, ignorenulls=True).over(frame(asc, preceding)).alias("__mb")
        )
        mb = F.col("__mb")
        valid = mb.isNotNull()
        if tol is not None:
            valid = valid & (diff_back(mb) <= tol)
        chosen = F.when(valid, mb)
    elif direction == "forward":
        carried = unioned.select(
            "*", F.last(payload, ignorenulls=True).over(frame(desc, preceding)).alias("__mf")
        )
        mf = F.col("__mf")
        valid = mf.isNotNull()
        if tol is not None:
            valid = valid & (diff_fwd(mf) <= tol)
        chosen = F.when(valid, mf)
    else:  # nearest: both passes over the SAME asc sort — still one shuffle.
        # The following frame misses a build row at exactly equal `on`
        # (it sorts before the probe), but that row is the backward match
        # at distance 0, which wins every nearest comparison anyway.
        carried = unioned.select(
            "*",
            F.last(payload, ignorenulls=True).over(frame(asc, preceding)).alias("__mb"),
            F.first(payload, ignorenulls=True).over(frame(asc, following)).alias("__mf"),
        )
        mb, mf = F.col("__mb"), F.col("__mf")
        valid_b = mb.isNotNull()
        valid_f = mf.isNotNull() & F.col(on).isNotNull()
        if tol is not None:
            valid_b = valid_b & (diff_back(mb) <= tol)
            valid_f = valid_f & (diff_fwd(mf) <= tol)
        chosen = F.when(
            valid_b & (~valid_f | (diff_back(mb) <= diff_fwd(mf))), mb
        ).when(valid_f, mf)

    out = (
        carried.filter(F.col("__side") == 1)
        .select(
            *l_cols,
            chosen.alias("__m"),
        )
        .select(
            *l_cols,
            *[
                F.col("__m").getField(renamed[c]).alias(renamed[c])
                for c in val_cols
            ],
        )
    )
    if how == "inner":
        out = out.filter(F.col(on_r).isNotNull())
    return out
