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

Spark-first: one repartition on (run_key, qualifier) satisfies every
window (latest-per-app rank, min/max rank, contributor sums) and the
final per-column aggregate — a single shuffle whatever the flow
count; mode and retention are plain parameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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

    c = cells.repartition("run_key", "qualifier")
    col_w = Window.partitionBy("run_key", "qualifier")
    sum_family = F.col("agg_op").isin("SUM", "SUM_FINAL")

    # collect phase: newest per app for the SUM family, the single
    # extreme cell for GLOBAL_MIN / GLOBAL_MAX
    rn_app = F.row_number().over(
        Window.partitionBy("run_key", "qualifier", "app_id").orderBy(
            F.col("ts").desc()
        )
    )
    rn_min = F.row_number().over(
        col_w.orderBy(F.col("value").asc(), F.col("ts").desc())
    )
    rn_max = F.row_number().over(
        col_w.orderBy(F.col("value").desc(), F.col("ts").desc())
    )
    s1 = c.select(
        "*",
        (
            F.when(F.col("agg_op").isNull(), True)
            .when(sum_family, rn_app == 1)
            .when(F.col("agg_op") == "GLOBAL_MIN", rn_min == 1)
            .otherwise(rn_max == 1)
        ).alias("_collected"),
    ).where("_collected")

    # exactly TWO consumers of the collected subtree — one row-level
    # branch (passthrough, extremes, and the compaction's written-back
    # cells share a per-row emit label) and one aggregate branch — so
    # the window pass is not re-derived once per emit kind
    folded = (F.col("agg_op") == "SUM_FINAL") & (
        F.expr("ts div 1000000") + retention_ms < now_ms
    )
    row_emit = (
        F.when(F.col("agg_op").isNull(), RAW)
        .when(F.col("agg_op") == "GLOBAL_MIN", MIN)
        .when(F.col("agg_op") == "GLOBAL_MAX", MAX)
        .when(
            F.lit(mode == MAJOR_COMPACTION) & sum_family & ~folded, KEPT
        )
    )
    row_level = (
        s1.select(
            "run_key", "qualifier", "app_id", "ts", "value",
            row_emit.alias("emit"),
        )
        .where(F.col("emit").isNotNull())
    )

    if mode == READ:
        agg_level = (
            s1.where(sum_family)
            .groupBy("run_key", "qualifier")
            .agg(F.max("ts").alias("ts"), F.sum("value").alias("value"))
            .select(
                "run_key", "qualifier",
                F.lit(None).cast("string").alias("app_id"),
                "ts", "value", F.lit(SUM).alias("emit"),
            )
        )
    else:
        agg_level = (
            s1.where(sum_family & folded)
            .groupBy("run_key", "qualifier")
            .agg(F.sum("value").alias("value"))
            .select(
                "run_key", "qualifier",
                F.lit(FLOW_APP_ID).alias("app_id"),
                F.lit(None).cast("long").alias("ts"),
                "value", F.lit(NEW_SUM).alias("emit"),
            )
        )
    return row_level.unionByName(agg_level)
