"""Relational helpers: top-k, sorted merge, content-summary rollups.

These wrap idiomatic Spark plans with the semantics the reference exposes
through its shell/aggregation surface (SURVEY.md §2.4, §2.5):

- top_k        → TakeOrderedAndProject physical op (no full sort; each
                 partition keeps k rows, driver merges) — the scale-correct
                 replacement for ls-sort + head.
- merge_sorted → SequenceFile.Sorter.merge (SequenceFile.java:3185): N
                 sorted inputs co-sequenced into one sorted output. In
                 Spark: union + repartitionByRange + sortWithinPartitions,
                 which is a range-partitioned external merge — the same
                 spill/merge design, distributed.
- content_summary → ContentSummary subtree rollup (ContentSummary.java:34,
                 FSDirStatAndListingOp.java:508): GROUP BY prefix with
                 count/sum, the reference's only aggregation pipeline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_source_spark.operators.setops import union_all


def top_k(df: DataFrame, k: int, order: Sequence[Column | str]) -> DataFrame:
    """Global top-k. orderBy + limit lowers to TakeOrderedAndProject:
    per-partition bounded heaps, no global sort — O(n) scan at any scale."""
    return df.orderBy(*order).limit(k)


def merge_sorted(dfs: Sequence[DataFrame], order: Sequence[str]) -> DataFrame:
    """K-way merge of sorted (or unsorted) conformant inputs.

    Output is globally sorted by `order`: range partitioning gives
    cross-partition order, sortWithinPartitions gives in-partition order.
    Downstream consumers reading partitions in order observe the merged
    stream — equivalent to Sorter.merge's RawKeyValueIterator.
    """
    cols = [F.col(c) for c in order]
    return union_all(dfs).repartitionByRange(*cols).sortWithinPartitions(*cols)


def with_global_positions(
    df: DataFrame,
    order: Sequence[str],
    pos_col: str = "pos",
    total_col: str | None = None,
) -> DataFrame:
    """Global 0-based row position in `order` — no driver row traffic, no
    Python row path (replaces rdd.zipWithIndex, which deserializes every
    row into Python).

    ArrayFile semantics (io/ArrayFile.java:38: long position → value).

    Plan: range-partition + sort within partitions (the merge_sorted
    shape), pin partitions with a lazy localCheckpoint, then derive
    pid/in-partition index from monotonically_increasing_id (which is
    ``pid << 33 | local_index`` with local_index consecutive from 0 in
    physical row order — exactly the sorted order here). One tiny count
    job (one row per partition) builds the broadcast offset map; the
    final job adds ``offset[pid] + local_index``. Zero extra shuffles
    beyond the range exchange itself, at any scale.
    """
    cols = [F.col(c) for c in order]
    ranged = (
        df.repartitionByRange(*cols)
        .sortWithinPartitions(*cols)
        .localCheckpoint(eager=False)
    )
    ided = ranged.select(
        "*", F.monotonically_increasing_id().alias("__mid")
    )
    pid = F.shiftrightunsigned(F.col("__mid"), 33)
    local_ix = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    counts = {
        r["pid"]: r["cnt"]
        for r in ided.groupBy(pid.alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    omap = F.create_map(
        *[F.lit(x) for p, off in offsets.items() for x in (p, off)]
    )
    out = ided.select(
        (omap[pid] + local_ix).alias(pos_col), "*"
    ).drop("__mid")
    if total_col is not None:
        # the offsets pass already knows the total — attach it as a
        # literal instead of paying a second count job
        out = out.withColumn(total_col, F.lit(acc))
    return out


def global_ntile(
    df: DataFrame,
    order: Sequence[str],
    buckets: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact ``NTILE(k) OVER (ORDER BY order)`` WITHOUT the
    single-partition global window sort Spark would otherwise plan
    (WindowExec warns 'Moving all data to a single partition').

    Built on with_global_positions (range exchange + per-partition sort +
    broadcast offsets), then the standard NTILE split arithmetic: with n
    rows in k buckets, the first ``n % k`` buckets take ``n div k + 1``
    rows. Same result as F.ntile, but every stage is partition-parallel —
    the plan that still works when `order` spans 10^12 rows.

    Note: positions are < 2^53, so the floor/ceil double arithmetic below
    is exact at any realistic scale.
    """
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    pos = with_global_positions(df, order, pos_col="__gpos", total_col="__n")
    p = F.col("__gpos") + 1  # 1-based rank
    n = F.col("__n")
    base = F.floor(n / buckets)
    rem = n % buckets
    cut = rem * (base + 1)  # rows living in the size-(base+1) buckets
    bucket = (
        F.when(p <= cut, F.ceil(p / (base + 1)))
        .otherwise(rem + F.ceil((p - cut) / F.greatest(base, F.lit(1))))
    )
    return pos.withColumn(bucket_col, bucket.cast("int")).drop("__gpos", "__n")


def content_summary(
    df: DataFrame,
    group: Sequence[str] | str,
    size_col: str,
    extra_aggs: Sequence[Column] = (),
) -> DataFrame:
    """du/count-style rollup: row count + total size per group."""
    group = [group] if isinstance(group, str) else list(group)
    return df.groupBy(*group).agg(
        F.count(F.lit(1)).alias("file_count"),
        F.sum(size_col).alias("length"),
        *extra_aggs,
    )


def grouped_quantiles(
    df: DataFrame,
    group: Sequence[str] | str,
    value_col: str,
    probs: Sequence[float] = (0.5, 0.9, 0.99),
    approx: bool = False,
) -> DataFrame:
    """Per-group percentiles (SampleQuantiles.java:50 / MutableQuantiles).

    approx=True uses approx_percentile (the GK-family sketch, mergeable,
    constant memory — the 100 TB path). approx=False uses exact
    `percentile` for oracle-checkable results at test scale.
    """
    group = [group] if isinstance(group, str) else list(group)
    fn = F.approx_percentile if approx else F.percentile
    aggs = [
        fn(F.col(value_col), F.lit(p)).alias(f"p{int(p * 100):02d}")
        for p in probs
    ]
    return df.groupBy(*group).agg(*aggs)
