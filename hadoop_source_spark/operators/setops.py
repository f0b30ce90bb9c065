"""Set operators and snapshot diff.

Snapshot diff re-expresses HDFS snapshot comparison
(hdfs-client/.../protocol/SnapshotDiffReport.java:35, DiffType at :44-48:
CREATE '+', MODIFY 'M', DELETE '-', RENAME 'R') as a keyed full-outer join
between two table versions. RENAME detection requires an identity separate
from the key (HDFS uses inode ids); with a pure-key model a rename shows up
as DELETE+CREATE, which is also what HDFS reports without inode tracking.

Scale: one shuffle on the key columns; value comparison is a null-safe
equality on the compared columns, evaluated JVM-side.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    v1: DataFrame,
    v2: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str] | None = None,
) -> DataFrame:
    """Classify rows of v2 vs v1 into '+', '-', 'M'.

    Returns the key columns plus a ``change`` column; unchanged rows are
    dropped (SnapshotDiffReport only reports differences).
    """
    keys = list(keys)
    compare = list(compare if compare is not None else [c for c in v1.columns if c not in keys])

    a = v1.select(*keys, F.struct(*[F.col(c) for c in compare]).alias("__v1"))
    b = v2.select(*keys, F.struct(*[F.col(c) for c in compare]).alias("__v2"))
    joined = a.join(b, on=keys, how="full_outer")
    change = (
        F.when(F.col("__v1").isNull(), F.lit("+"))
        .when(F.col("__v2").isNull(), F.lit("-"))
        .when(~F.col("__v1").eqNullSafe(F.col("__v2")), F.lit("M"))
    )
    return (
        joined.select(*keys, change.alias("change"))
        .filter(F.col("change").isNotNull())
    )


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """ViewFs-style union of N conformant sources (ViewFileSystem.java:89)."""
    return reduce(lambda x, y: x.unionByName(y), dfs)
