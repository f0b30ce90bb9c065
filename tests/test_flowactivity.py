"""ATSv2 flow-activity table pins (HBaseTimelineWriterImpl.java:
302-349, FlowActivityRowKey.java:164-186,
FlowActivityEntityReader.java:102-190,
HBaseTimelineSchemaUtils.java:120-124)."""

from __future__ import annotations

from hadoop_source_spark.operators import flowactivity as fa

SCHEMA = (
    "cluster string, event_ts long, user_id string, flow_name string,"
    " run_id long, version string, write_ts long"
)
DAY = fa.DAY_MS


def test_day_truncation_and_overwrite(spark):
    rows = [
        # same cell written twice: the newest write's version wins
        ("c1", 5 * DAY + 100, "u1", "f1", 7, "v1", 10),
        ("c1", 5 * DAY + 999, "u1", "f1", 7, "v2", 20),
        # same run on another day is a separate cell
        ("c1", 6 * DAY + 1, "u1", "f1", 7, "v3", 30),
    ]
    out = fa.flow_activity_table(
        spark.createDataFrame(rows, SCHEMA)
    ).collect()
    by = {(r["day_ts"], r["run_id"]): r["version"] for r in out}
    assert by[(5 * DAY, 7)] == "v2"
    assert by[(6 * DAY, 7)] == "v3"
    assert len(out) == 2


def test_scan_limits_activities_not_runs(spark):
    rows = []
    # day 9: one flow with 5 runs; day 8: three flows with 1 run each
    for run in range(5):
        rows.append(("c1", 9 * DAY, "u1", "fA", run, "v", run))
    for i, fl in enumerate(["fB", "fC", "fD"]):
        rows.append(("c1", 8 * DAY, "u1", fl, 100 + i, "v", 50 + i))
    # another cluster never appears
    rows.append(("c2", 9 * DAY, "u1", "fX", 999, "v", 99))
    cells = fa.flow_activity_table(spark.createDataFrame(rows, SCHEMA))
    out = fa.flow_activity_scan(cells, cluster="c1", limit=2).collect()
    # page = 2 ACTIVITY rows: (day9, fA) rank 1 with its 5 runs, then
    # (day8, fB) rank 2 -- newest day first, then user/flow ascending
    assert sorted(r["run_id"] for r in out if r["activity_rank"] == 1) \
        == [0, 1, 2, 3, 4]
    assert [r["flow_name"] for r in out if r["activity_rank"] == 2] \
        == ["fB"]
    assert {r["activity_rank"] for r in out} == {1, 2}


def test_scan_created_time_range(spark):
    rows = [
        ("c1", 7 * DAY, "u1", "f1", 1, "v", 1),
        ("c1", 8 * DAY, "u1", "f2", 2, "v", 2),
        ("c1", 9 * DAY, "u1", "f3", 3, "v", 3),
    ]
    cells = fa.flow_activity_table(spark.createDataFrame(rows, SCHEMA))
    out = fa.flow_activity_scan(
        cells, cluster="c1", created_begin=8 * DAY,
        created_end=8 * DAY, limit=10,
    ).collect()
    assert [r["flow_name"] for r in out] == ["f2"]
