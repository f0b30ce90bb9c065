"""ATSv2 flow-run metric rollup: how the timeline service's HBase
coprocessor aggregates per-application metric cells into per-flow-run
values at read and compaction time.

Reference semantics (`hadoop-yarn-server-timelineservice-hbase-server/
.../flow/FlowScanner.java`):

- Cells carry an AggregationOperation tag; within one (row, column)
  the collect phase (``collectCells:262-335``) keeps: the single
  minimum-value cell for GLOBAL_MIN, the single maximum for
  GLOBAL_MAX, and for SUM/SUM_FINAL only the NEWEST cell per
  aggregation dimension (the application id — cells arrive newest
  first and later ones for an already-seen app are dropped,
  :316-330). Untagged cells pass through unchanged (:268-271).
- READ emit (``processSummation:389-416``): one cell per column
  whose value is the sum of the latest-per-app values and whose
  timestamp is the most recent contributing cell's.
- MAJOR_COMPACTION emit (``processSummationMajorCompaction:
  432-530``): a SUM_FINAL cell whose TRUNCATED timestamp
  (``TimestampGenerator.getTruncatedTimestamp`` — the supplemented
  timestamp divided by 1_000_000) is older than
  ``appFinalValueRetentionThreshold`` folds into a running sum and
  is discarded; everything else is written back unchanged; when
  anything folded, one new SUM_FINAL cell tagged with the synthetic
  FLOW_APP_ID carries the sum. (The ``appId == FLOW_APP_ID``
  reference-equality branch at :454 never fires for tag-decoded
  strings — an existing flow-sum cell takes the ordinary SUM_FINAL
  path, which re-folds it once old enough; we model that actual
  behavior.)

Spark-first: the WHOLE collect phase is ONE aggregate over one
repartition on (run_key, qualifier) — extremes group per (row,
column, op) and the SUM family one key finer (the app id), with a
single ``min_by`` over a composite (rank, -ts) ordering standing in
for every per-rule rank window the previous formulation carried.
Untagged cells never shuffle at all, and both emit consumers filter
on the PICKED struct rather than a grouping key so the
scan→exchange subtree stays identical and ReuseExchange ships the
tagged cells exactly once. No rank windows anywhere; mode and
retention are plain parameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FLOW_APP_ID = "application_00000000000_0000"
READ = "READ"
MAJOR_COMPACTION = "MAJOR_COMPACTION"

RAW = "RAW"
MIN = "MIN"
MAX = "MAX"
SUM = "SUM"
KEPT = "KEPT"
NEW_SUM = "NEW_SUM"


def flow_scan(
    cells: DataFrame,
    *,
    mode: str,
    now_ms: int = 0,
    retention_ms: int = 0,
) -> DataFrame:
    """One FlowScanner pass over a cell table.

    ``cells``: (run_key string, qualifier string, app_id string,
    ts long — the supplemented timestamp, value long, agg_op string
    nullable in GLOBAL_MIN | GLOBAL_MAX | SUM | SUM_FINAL; null
    passes through). ``mode`` is READ or MAJOR_COMPACTION; the
    retention arguments only apply to the latter.

    Returns (run_key, qualifier, app_id nullable, ts nullable,
    value, emit). The compaction's new sum cell carries a
    supplemented wall-clock timestamp in the reference (:500-503) —
    emitted as NULL here for determinism; equal-value extreme cells
    break ties toward the newest (the fixture keeps values distinct,
    so this never decides a driver row)."""
    if mode not in (READ, MAJOR_COMPACTION):
        raise ValueError("unknown FlowScanner mode %r" % mode)

    # Untagged cells pass through unchanged (:268-271) — straight
    # from the source, no shuffle at all.
    raw = cells.where(F.col("agg_op").isNull()).select(
        "run_key", "qualifier", "app_id", "ts", "value",
        F.lit(RAW).alias("emit"),
    )

    # The collect phase as one aggregate: extremes per (row, column,
    # op); the SUM family one key finer — SUM and SUM_FINAL share the
    # seen-dimension set (:316-330), so `_kind` collapses them to one
    # 'S' group per app. The pick is min_by over a composite
    # (rank, -ts) ordering — GLOBAL_MIN ranks by value, GLOBAL_MAX by
    # -value, the SUM family by ts alone; equal ranks break toward
    # the newest cell (:276-287). Metric values/timestamps sit far
    # from the +-2^63 negation edge.
    sum_family = F.col("agg_op").isin("SUM", "SUM_FINAL")
    rank = (
        F.when(F.col("agg_op") == "GLOBAL_MIN", F.col("value"))
        .when(F.col("agg_op") == "GLOBAL_MAX", -F.col("value"))
        .otherwise(F.lit(0).cast("long"))
    )
    collected = (
        cells.where(F.col("agg_op").isNotNull())
        .repartition("run_key", "qualifier")
        .groupBy(
            "run_key",
            "qualifier",
            F.when(sum_family, F.lit("S"))
            .otherwise(F.col("agg_op"))
            .alias("_kind"),
            F.when(sum_family, F.col("app_id")).alias("_dim"),
        )
        .agg(
            F.min_by(
                F.struct("app_id", "ts", "value", "agg_op"),
                F.struct(rank.alias("r"), (-F.col("ts")).alias("nts")),
            ).alias("c")
        )
    )
    # Both consumers below filter on the PICKED struct, never on a
    # grouping key, so the predicates cannot push past the aggregate
    # and the scan->exchange subtree stays byte-identical:
    # ReuseExchange ships the tagged cells exactly once.
    folded = (F.col("c.agg_op") == "SUM_FINAL") & (
        F.expr("c.ts div 1000000") + retention_ms < now_ms
    )
    row_emit = (
        F.when(F.col("c.agg_op") == "GLOBAL_MIN", MIN)
        .when(F.col("c.agg_op") == "GLOBAL_MAX", MAX)
        .when(F.lit(mode == MAJOR_COMPACTION) & ~folded, KEPT)
    )
    row_level = collected.select(
        "run_key", "qualifier",
        F.col("c.app_id").alias("app_id"),
        F.col("c.ts").alias("ts"),
        F.col("c.value").alias("value"),
        row_emit.alias("emit"),
    ).where(F.col("emit").isNotNull())

    if mode == READ:
        # processSummation:389-416 — hash-partitioning on the coarser
        # (run_key, qualifier) pair survives the finer grouping above,
        # so this aggregate adds no exchange.
        agg_level = (
            collected.where(F.col("c.agg_op").isin("SUM", "SUM_FINAL"))
            .groupBy("run_key", "qualifier")
            .agg(
                F.max("c.ts").alias("ts"),
                F.sum("c.value").alias("value"),
            )
            .select(
                "run_key", "qualifier",
                F.lit(None).cast("string").alias("app_id"),
                "ts", "value", F.lit(SUM).alias("emit"),
            )
        )
    else:
        # processSummationMajorCompaction:432-530 fold.
        agg_level = (
            collected.where(folded)
            .groupBy("run_key", "qualifier")
            .agg(F.sum("c.value").alias("value"))
            .select(
                "run_key", "qualifier",
                F.lit(FLOW_APP_ID).alias("app_id"),
                F.lit(None).cast("long").alias("ts"),
                "value", F.lit(NEW_SUM).alias("emit"),
            )
        )
    return raw.unionByName(row_level).unionByName(agg_level)
