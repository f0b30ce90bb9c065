"""Round-14 second batch, pinned per reference tests:
TestEntityGroupFSTimelineStore (ATS 1.5 plugin storage),
TestAmFilter / TestProxyUriUtils (web proxy),
TestRollingFileSystemSink (metrics2 sink)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hadoop_source_spark.operators import egfsstore as eg
from hadoop_source_spark.operators import metrics2sink as ms
from hadoop_source_spark.operators import webproxy as wp


def _listing(spark, rows):
    return spark.createDataFrame(
        rows, "path string, is_dir boolean, mtime long"
    )


# ----------------------------------------------------------------- egfs

def test_egfs_discover_app_dirs_user_layer_and_junk(spark):
    lst = _listing(spark, [
        ("active", True, 0),
        ("active/application_1_1", True, 0),
        ("active/user1", True, 0),
        ("active/user1/application_1_2", True, 0),
        # scanActiveLogs does not recurse INTO app dirs
        ("active/application_1_1/application_1_3", True, 0),
        # plain files are ignored with a warning
        ("active/loosefile", False, 0),
        ("active/user1/notanapp", True, 0),
    ])
    got = {r["app_id"] for r in eg.discover_app_dirs(lst, "active").collect()}
    assert got == {"application_1_1", "application_1_2"}


def test_egfs_log_classification_and_mtime_rules(spark):
    app = "active/application_1_1"
    lst = _listing(spark, [
        (app, True, 50),
        (f"{app}/appattempt_1_1_000001", True, 60),
        (f"{app}/appattempt_1_1_000001/domainlog-d1", False, 100),
        (f"{app}/appattempt_1_1_000001/summarylog-s1", False, 300),
        (f"{app}/appattempt_1_1_000001/entitylog-g1", False, 200),
        # skipped files must NOT advance the newest-log mtime
        (f"{app}/appattempt_1_1_000001/other.tmp", False, 999),
        # non-attempt child dirs are not scanned
        (f"{app}/data", True, 60),
        (f"{app}/data/summarylog-hidden", False, 998),
    ])
    dirs = eg.discover_app_dirs(lst, "active")
    logs = {r["filename"]: r["log_kind"]
            for r in eg.classify_logs(lst, dirs).collect()}
    assert logs == {"domainlog-d1": "DOMAIN", "summarylog-s1": "SUMMARY",
                    "entitylog-g1": "ENTITY", "other.tmp": "SKIP"}
    roll = eg.app_scan_rollup(lst, dirs, now=10_000,
                              unknown_active_ms=1_000).collect()[0]
    assert roll["n_domain"] == 1 and roll["n_summary"] == 1
    assert roll["n_entity"] == 1 and roll["n_skipped"] == 1
    assert roll["newest_log_mtime"] == 300
    assert roll["state"] == eg.ACTIVE


def test_egfs_empty_app_dir_falls_back_to_dir_mtime_and_unknown(spark):
    lst = _listing(spark, [
        ("staging/application_1_9", True, 500),
    ])
    dirs = eg.discover_app_dirs(lst, "staging")
    # scanForLogs:790-794 — no logs → the dir's own mtime; UNKNOWN apps
    # with stale logs are assumed COMPLETED (parseSummaryLogs:716-723)
    fresh = eg.app_scan_rollup(lst, dirs, now=600,
                               unknown_active_ms=1_000).collect()[0]
    assert fresh["newest_log_mtime"] == 500
    assert fresh["state"] == eg.UNKNOWN
    stale = eg.app_scan_rollup(lst, dirs, now=5_000,
                               unknown_active_ms=1_000).collect()[0]
    assert stale["state"] == eg.COMPLETED


def test_egfs_done_path_buckets(spark):
    df = spark.range(1).select(
        eg.done_app_path(F.lit(2234567), F.lit(1234), "done").alias("p")
    )
    # getDoneAppPath:589-596 — id/1e6 then (id/1e3) mod 1e3, %04d
    assert df.collect()[0]["p"] == \
        "done/1234/0002/0234/application_1234_2234567"


def test_egfs_clean_plan_matrix(spark):
    lst = _listing(spark, [
        ("done/111", True, 100),
        ("done/111/0000/0000/application_111_1", True, 100),
        # one fresh descendant keeps the dir (shouldCleanAppLogDir)
        ("done/111/0000/0000/application_111_1/f1", False, 9_000),
        ("done/111/0000/0000/application_111_2", True, 100),
        ("done/111/0000/0000/application_111_2/f1", False, 100),
        # empty app dir → delete
        ("done/111/0000/0000/application_111_3", True, 100),
        # numeric ts dir with no app dirs, stale → delete
        ("done/222", True, 100),
        # fresh empty ts dir → keep
        ("done/333", True, 9_500),
        # non-numeric dir at ts level is not a ts dir
        ("done/notnumeric", True, 100),
    ])
    out = {(r["path"], r["kind"]): r["decision"]
           for r in eg.clean_plan(lst, "done", now=10_000,
                                  retain_ms=5_000).collect()}
    assert out[("done/111/0000/0000/application_111_1", "app_dir")] == "KEEP"
    assert out[("done/111/0000/0000/application_111_2", "app_dir")] == "DELETE"
    assert out[("done/111/0000/0000/application_111_3", "app_dir")] == "DELETE"
    assert out[("done/111", "ts_dir")] == "KEEP"
    assert out[("done/222", "ts_dir")] == "DELETE"
    assert out[("done/333", "ts_dir")] == "KEEP"
    assert ("done/notnumeric", "ts_dir") not in out


# ---------------------------------------------------------------- proxy

def _requests(spark, rows):
    return spark.createDataFrame(
        rows, "req_id string, remote_addr string, request_uri string,"
        " query_string string, cookie_user string"
    )


def _filter_one(spark, row, addrs=("192.168.1.1",),
                base="http://bogus/proxy/application_00_0"):
    return wp.am_filter_matrix(
        _requests(spark, [row]), addrs, base
    ).collect()[0].asDict()


def test_amfilter_redirect_inserts_after_first_proxy_of_combined(spark):
    # TestAmFilter.testFilter redirect shape: the insert point is
    # scanned on base+URI, so a base containing /proxy gets the insert
    r = _filter_one(spark, ("r1", "10.0.0.9", "/foo/bar", None, None))
    assert r["action"] == wp.REDIRECT_ACTION
    assert r["redirect_url"] == \
        "http://bogus/proxy/redirect/application_00_0/foo/bar"
    # query string is re-appended
    r = _filter_one(spark, ("r2", "10.0.0.9", "/foo", "a=1&b=2", None))
    assert r["redirect_url"].endswith("/foo?a=1&b=2")


def test_amfilter_pass_through_and_principal(spark):
    r = _filter_one(spark, ("r1", "192.168.1.1", "/x", None, "testuser"))
    assert r["action"] == wp.PASS_WITH_USER
    assert r["principal"] == "testuser" and r["redirect_url"] is None
    r = _filter_one(spark, ("r2", "192.168.1.1", "/x", None, None))
    assert r["action"] == wp.PASS_ANON and r["principal"] is None


def test_proxy_path_build_and_parse(spark):
    df = spark.createDataFrame(
        [("/proxy/application_100_1/jobs/j1",),
         ("/proxy/redirect/application_100_1",),
         ("/cluster/apps",),
         ("/proxy/notanapp",)],
        "p string",
    )
    is_p, red, app, rest = wp.parse_proxy_path(F.col("p"))
    rows = df.select(
        "p", is_p.alias("ip"), red.alias("rd"),
        app.alias("app"), rest.alias("rest"),
    ).collect()
    by = {r["p"]: r for r in rows}
    r = by["/proxy/application_100_1/jobs/j1"]
    assert r["ip"] and not r["rd"]
    assert r["app"] == "application_100_1" and r["rest"] == "jobs/j1"
    r = by["/proxy/redirect/application_100_1"]
    assert r["ip"] and r["rd"] and r["rest"] is None
    assert not by["/cluster/apps"]["ip"]
    assert not by["/proxy/notanapp"]["ip"]
    built = spark.range(1).select(
        wp.proxy_path(F.lit("application_100_1"), F.lit("jobs/j1")).alias("a"),
        wp.proxy_path(F.lit("application_100_1"), None, redirected=True)
        .alias("b"),
    ).collect()[0]
    # TestProxyUriUtils.testGetPathApplicationIdString shapes
    assert built["a"] == "/proxy/application_100_1/jobs/j1"
    assert built["b"] == "/proxy/redirect/application_100_1"


# -------------------------------------------------------------- metrics

def test_roll_interval_spec():
    # getRollInterval:342-390 unit table; bare number = hours
    assert ms.roll_interval_ms("10m") == 600_000
    assert ms.roll_interval_ms(" 2 hours ") == 7_200_000
    assert ms.roll_interval_ms("1d") == 86_400_000
    assert ms.roll_interval_ms("3") == 10_800_000
    for bad in ("0m", "abc", "5 weeks"):
        with pytest.raises(ValueError):
            ms.roll_interval_ms(bad)


def test_metrics_line_roundtrip(spark):
    recs = spark.createDataFrame(
        [(1_700_000_000_123, "dfs", "namenode",
          {"Hostname": "h=1.example", "ops": "42.5"})],
        "ts long, context string, record string, kvs map<string,string>",
    )
    line = ms.format_metrics_lines(recs).collect()[0]["line"]
    # putMetrics:823-845 — '<ts> <ctx>.<record>: k=v, k=v'
    assert line.startswith("1700000000123 dfs.namenode: ")
    assert "ops=42.5" in line and "Hostname=h=1.example" in line
    back = ms.parse_metrics_lines(
        spark.createDataFrame([(line,)], "line string")
    ).collect()[0]
    assert back["ts"] == 1_700_000_000_123
    assert back["context"] == "dfs" and back["record"] == "namenode"
    # value split is on the FIRST '=' — 'h=1.example' survives
    assert back["kvs"] == {"Hostname": "h=1.example", "ops": "42.5"}


def test_metrics_bucket_dir_floors_to_interval(spark):
    out = spark.createDataFrame(
        [(1_700_000_000_000,)], "ts long"
    ).select(ms.bucket_dir(F.col("ts"), 3_600_000).alias("b")).collect()[0]
    # 2023-11-14 22:13:20 GMT floored to the hour
    assert out["b"] == "202311142200"
