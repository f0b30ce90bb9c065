"""Z-order (Morton) data layout: multi-dimensional clustering so that
range predicates on EITHER (or both) of two columns prune parquet row
groups/files via min-max stats — the Delta/Iceberg OPTIMIZE ZORDER
technique (public), and the declarative answer to the reference's
locality machinery (block placement controls WHERE bytes live;
z-ordering controls WHICH bytes a 2-D selective scan must touch).

Everything is JVM-side codegen: quantization is min-max arithmetic
(the min/max pair is a one-row broadcast, no window, no global sort),
bit interleaving is an unrolled shift/or expression, and the physical
clustering is repartitionByRange(z) + sortWithinPartitions(z) — a
single range exchange, the same cost as any global sort, paid once at
write time to make every later selective scan cheaper."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, mn: Column, mx: Column, bits: int = 16) -> Column:
    """Min-max quantize to [0, 2^bits): rank-free (no window), monotone,
    so per-file z ranges translate back to per-dimension ranges."""
    span = (mx.cast("double") - mn.cast("double"))
    q = F.when(
        span > 0,
        ((col.cast("double") - mn) / span * ((1 << bits) - 1)),
    ).otherwise(F.lit(0.0))
    return F.floor(q).cast("long")


def z_value(xq: Column, yq: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` of two quantized ints (x even lanes,
    y odd lanes) — unrolled shiftleft/or chain, whole-stage codegen."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xq, i) % 2, 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(yq, i) % 2, 2 * i + 1))
    return z


def with_z(
    df: DataFrame, x_col: str, y_col: str, bits: int = 16
) -> DataFrame:
    """Add a `z` column from the two dimensions, quantized against the
    table's own min/max (one tiny agg, broadcast back)."""
    stats = df.agg(
        F.min(x_col).alias("__xmin"), F.max(x_col).alias("__xmax"),
        F.min(y_col).alias("__ymin"), F.max(y_col).alias("__ymax"),
    )
    j = df.crossJoin(F.broadcast(stats))
    xq = quantize(F.col(x_col), F.col("__xmin"), F.col("__xmax"), bits)
    yq = quantize(F.col(y_col), F.col("__ymin"), F.col("__ymax"), bits)
    return j.withColumn("z", z_value(xq, yq, bits)).drop(
        "__xmin", "__xmax", "__ymin", "__ymax"
    )


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    num_files: int = 16,
    bits: int = 16,
) -> None:
    """Cluster rows along the Morton curve and write parquet so each
    file covers a compact 2-D tile: range-partition by z (one exchange),
    sort within partitions, one file per partition."""
    (
        with_z(df, x_col, y_col, bits)
        .repartitionByRange(num_files, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(path)
    )


def range_partition_plan(
    df: DataFrame,
    key_col: str,
    num_partitions: int,
    exact: bool = False,
) -> DataFrame:
    """Range-partition boundary advisor: the cut points
    repartitionByRange would want, plus the row count and skew each
    resulting partition actually gets — the planning half of a layout
    rewrite (Spark's RangePartitioner does the same by sampling;
    reference analog: the balancer's byte-balanced target computation,
    hdfs/server/balancer/Balancer.java init of over/under-utilized
    sets).

    Boundaries are the 1/N..(N-1)/N quantiles of `key_col` —
    `approx_percentile` by default (the 100 TB path: mergeable sketch,
    one partial agg), `percentile` when `exact` (small data / oracle
    parity). Assignment counts rows per bucket IN THE SAME PLAN via a
    broadcast of the one-row boundary array — no collect, no second
    job. Output per partition: partition_id, lo, hi (null at the open
    ends), est_rows, skew (est_rows over the uniform share)."""
    probs = [i / num_partitions for i in range(1, num_partitions)]
    fn = "percentile" if exact else "approx_percentile"
    bounds = df.agg(
        F.expr(
            f"{fn}({key_col}, array({', '.join(str(p) for p in probs)}))"
        ).alias("__bounds")
    )
    keyed = df.select(key_col).crossJoin(F.broadcast(bounds))
    # partition index = number of boundaries strictly below the key —
    # unrolled comparisons (engine-portable; no array lambda)
    idx = sum(
        (F.col(key_col) > F.get(F.col("__bounds"), i)).cast("int")
        for i in range(num_partitions - 1)
    )
    counts = (
        keyed.select(idx.alias("partition_id"), "__bounds")
        .groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("est_rows"),
            F.first("__bounds").alias("__bounds"),
        )
    )
    total = counts.agg(F.sum("est_rows").alias("__total"))
    pid = F.col("partition_id")
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            pid,
            F.when(pid > 0, F.round(F.get("__bounds", pid - 1), 6)).alias(
                "lo"
            ),
            F.when(
                pid < num_partitions - 1,
                F.round(F.get("__bounds", pid), 6),
            ).alias("hi"),
            "est_rows",
            F.round(
                F.col("est_rows")
                / (F.col("__total") / F.lit(num_partitions)),
                6,
            ).alias("skew"),
        )
    )
