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
