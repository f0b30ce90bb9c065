"""Range (interval) join: probe points joined to build intervals that
contain them, optionally alongside extra equi-keys.

Spark has no native range-join operator — a raw `p.ts BETWEEN b.lo AND
b.hi` condition (with no equi-key) plans as BroadcastNestedLoopJoin,
which is quadratic and OOMs the build side at scale. The standard scale
path (the same binning Databricks' range-join optimization and
KDB-style temporal engines use) turns it into an EQUI-join:

- pick a chunk width ~ the typical interval length;
- a probe point belongs to exactly ONE chunk: floor(ts / chunk);
- a build interval is EXPLODED to every chunk it overlaps
  (len/chunk + 1 rows — bounded, data-independent for bounded
  intervals);
- equi-join on (equi_keys…, chunk), then apply the exact BETWEEN as a
  post-join filter.

Each (point, interval) pair meets in exactly one chunk — the point's own
— so no dedup is needed. The join shuffles on (equi_keys, chunk), both
sides partition-pruned and AQE-skew-splittable; nothing is quadratic.

Chunk ids use integer `div`, never floating floor: nanosecond epochs
(~1.7e18) exceed float64's 2^53 integer range.

Reference parity: Hadoop's getClosest (MapFile.java:428) is the as-of
cousin (operators/asof.py); interval containment is the other temporal
join a telemetry/attribution workload needs — part of the beyond-the-
reference analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    lo: str,
    hi: str,
    chunk: int,
    equi_keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join probe rows to build intervals with probe[on] in [lo, hi].

    on/lo/hi are integer-valued columns in the same unit (e.g. epoch
    micros); bounds are inclusive (SQL BETWEEN). `chunk` is the bin width
    in that unit — choose it near the typical interval length: cost is
    one build row per overlapped chunk. Column names shared by both
    sides must be disambiguated by the caller (select/alias first).

    how="inner" emits matches only; how="left" keeps unmatched probe
    rows with null build columns (one row per match otherwise).
    """
    if chunk <= 0:
        raise ValueError(f"chunk must be positive, got {chunk}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = list(equi_keys or [])

    p = probe.withColumn("__chunk", F.expr(f"`{on}` div {chunk}"))
    b = build.filter(F.col(lo) <= F.col(hi)).withColumn(
        "__chunk",
        F.explode(F.sequence(F.expr(f"`{lo}` div {chunk}"), F.expr(f"`{hi}` div {chunk}"))),
    )
    cond = [p["__chunk"] == b["__chunk"]]
    for k in keys:
        cond.append(p[k] == b[k])
    cond.append(p[on].between(b[lo], b[hi]))
    joined = p.join(b, on=cond, how=how)
    # drop the helper and the build side's duplicate equi-key columns
    out_cols = [p[c] for c in probe.columns] + [
        b[c] for c in build.columns if c not in keys
    ]
    return joined.select(*out_cols)
