"""ATSv2 FlowScanner rollup pins (FlowScanner.java
collectCells:262-335, processSummation:389-416,
processSummationMajorCompaction:432-530)."""

from __future__ import annotations

from hadoop_source_spark.operators import flowrun

SCHEMA = (
    "run_key string, qualifier string, app_id string, ts long,"
    " value long, agg_op string"
)


def _scan(spark, cells, **kw):
    return flowrun.flow_scan(
        spark.createDataFrame(cells, SCHEMA), **kw
    ).collect()


def test_read_sums_latest_per_app_only(spark):
    out = _scan(
        spark,
        [
            # app a: two cells, newest (ts 500, v 30) wins
            ("r", "cpu", "a", 500, 30, "SUM"),
            ("r", "cpu", "a", 400, 99, "SUM"),
            # app b: one final cell
            ("r", "cpu", "b", 300, 12, "SUM_FINAL"),
        ],
        mode="READ",
    )
    (row,) = out
    assert (row["emit"], row["value"], row["ts"]) == ("SUM", 42, 500)
    assert row["app_id"] is None


def test_read_global_min_max_and_passthrough(spark):
    out = _scan(
        spark,
        [
            ("r", "start", "a", 10, 1000, "GLOBAL_MIN"),
            ("r", "start", "b", 20, 900, "GLOBAL_MIN"),
            ("r", "end", "a", 10, 5000, "GLOBAL_MAX"),
            ("r", "end", "b", 20, 7000, "GLOBAL_MAX"),
            ("r", "info", "a", 1, 7, None),
            ("r", "info", "b", 2, 8, None),
        ],
        mode="READ",
    )
    by = {(r["qualifier"], r["emit"]): r for r in out}
    assert by[("start", "MIN")]["value"] == 900
    assert by[("start", "MIN")]["app_id"] == "b"
    assert by[("end", "MAX")]["value"] == 7000
    # untagged cells all pass through
    assert sum(1 for r in out if r["emit"] == "RAW") == 2


def test_major_compaction_folds_old_finals(spark):
    NOW = 1_000_000
    SUP = 1_000_000  # supplemented-timestamp multiplier
    out = _scan(
        spark,
        [
            # old final -> folded (trunc ts 100 + 1000 < NOW)
            ("r", "cpu", "a", 100 * SUP + 1, 10, "SUM_FINAL"),
            ("r", "cpu", "b", 200 * SUP + 2, 20, "SUM_FINAL"),
            # young final -> kept
            ("r", "cpu", "c", (NOW - 5) * SUP, 40, "SUM_FINAL"),
            # running app -> kept regardless of age
            ("r", "cpu", "d", 50 * SUP, 80, "SUM"),
        ],
        mode="MAJOR_COMPACTION",
        now_ms=NOW,
        retention_ms=1000,
    )
    by = {r["app_id"]: r for r in out}
    assert by[flowrun.FLOW_APP_ID]["emit"] == "NEW_SUM"
    assert by[flowrun.FLOW_APP_ID]["value"] == 30
    assert by[flowrun.FLOW_APP_ID]["ts"] is None
    assert by["c"]["emit"] == "KEPT"
    assert by["d"]["emit"] == "KEPT"
    assert "a" not in by and "b" not in by


def test_major_compaction_no_fold_no_sum_cell(spark):
    out = _scan(
        spark,
        [("r", "cpu", "a", 999_000_000_000, 10, "SUM_FINAL")],
        mode="MAJOR_COMPACTION",
        now_ms=1_000_000,
        retention_ms=1_000_000_000,
    )
    assert [r["emit"] for r in out] == ["KEPT"]


def test_major_compaction_dedups_per_app_before_folding(spark):
    # only the newest cell per app participates; the older final
    # value for app a never reaches the sum
    NOW = 1_000_000
    SUP = 1_000_000
    out = _scan(
        spark,
        [
            ("r", "cpu", "a", 300 * SUP, 7, "SUM_FINAL"),
            ("r", "cpu", "a", 100 * SUP, 1000, "SUM_FINAL"),
        ],
        mode="MAJOR_COMPACTION",
        now_ms=NOW,
        retention_ms=1000,
    )
    (row,) = out
    assert (row["emit"], row["value"]) == ("NEW_SUM", 7)


def test_unknown_mode_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="mode"):
        flowrun.flow_scan(
            spark.createDataFrame([], SCHEMA), mode="FLUSH"
        )
