"""As-of join — the one genuinely custom operator the reference implies.

Reference semantics: ``MapFile.Reader.getClosest(key, val, before)``
(common/io/MapFile.java:699,715) returns the first entry >= key, or with
``before=True`` the last entry <= key. Joining a probe table against a
sorted build table under those semantics is an as-of join.

Spark-first design (scales to 100 TB):
We do NOT use a range join (O(n*m) worst case, nested-loop physical plan).
Instead: union probe and build rows, hash-partition by the equi-key, sort
within partitions by (ordering key, side), and carry the most recent build
row forward with ``last(..., ignorenulls=True)`` over an unbounded-preceding
window. Cost = ONE shuffle of (probe + build), same as any equi-join, and
the window runs inside the sorted partition — no cross product, no skew
amplification beyond what the equi-key itself has (AQE skew handling still
applies to the exchange).

Direction:
    backward (before=True analog): match the last build row with
        on_right <= on_left  (inclusive).
    forward  (before=False / getClosest default): match the first build row
        with on_right >= on_left (inclusive).
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
) -> DataFrame:
    """Join each left row to the nearest right row by ``on`` within ``by``.

    Columns of ``right`` (other than the by-keys) come back suffixed when
    they collide with a left column; the matched right ordering value is
    always exposed as ``{on}{suffix}``.

    how='inner' drops left rows with no match; how='left' keeps them with
    nulls (getClosest returns null before the first key).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    by_cols = [by] if isinstance(by, str) else list(by or [])

    # Disambiguate every non-key right column.
    left_names = set(left.columns)
    val_cols = [c for c in right.columns if c not in by_cols]
    renamed = {}
    for c in val_cols:
        out = c + suffix if (c in left_names or c == on) else c
        renamed[c] = out

    # A build row with a null ordering key can never be "the closest entry"
    # (MapFile keys are total-ordered and non-null); dropping them up front
    # also stops last(..., ignorenulls=True) from carrying their payload
    # into probe rows while {on}{suffix} stays null.
    r = right.filter(F.col(on).isNotNull()).select(
        *[F.col(c) for c in by_cols],
        *[F.col(c).alias(renamed[c]) for c in val_cols],
        F.lit(0).alias("__side"),
    )
    l = left.select(
        "*",
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(r.schema[renamed[c]].dataType).alias(renamed[c]) for c in val_cols],
    )
    on_r = renamed[on]

    # Align the union column order explicitly.
    l_cols = by_cols + [on] + [c for c in left.columns if c not in by_cols and c != on]
    unioned = l.select(
        *l_cols, "__side", *[renamed[c] for c in val_cols]
    ).unionByName(
        r.select(
            *by_cols,
            F.col(on_r).alias(on),
            *[F.lit(None).cast(l.schema[c].dataType).alias(c)
              for c in l_cols if c not in by_cols and c != on],
            "__side",
            *[renamed[c] for c in val_cols],
        )
    )

    # Null probe keys sort FIRST in both directions: nothing precedes them
    # in the frame, so they match no build row (NULL out / dropped by
    # how='inner') instead of accidentally pairing with the min/max key.
    if direction == "backward":
        # build rows sort before probe rows at equal `on` → inclusive match
        order: list[Column] = [F.col(on).asc_nulls_first(), F.col("__side").asc()]
    else:
        order = [F.col(on).desc_nulls_first(), F.col("__side").asc()]
    frame = Window.partitionBy(*by_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )

    carried = unioned.select(
        "*",
        *[
            F.last(renamed[c], ignorenulls=True).over(frame).alias("__m_" + renamed[c])
            for c in val_cols
        ],
    )
    out = (
        carried.filter(F.col("__side") == 1)
        .select(
            *l_cols,
            *[F.col("__m_" + renamed[c]).alias(renamed[c]) for c in val_cols],
        )
    )
    if how == "inner":
        out = out.filter(F.col(on_r).isNotNull())
    elif how != "left":
        raise ValueError(f"how must be inner|left, got {how}")
    return out
