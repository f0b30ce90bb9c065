"""Audit-log round-trip and embedding class-stats semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hadoop_source_spark.llmops import similarity as sim
from hadoop_source_spark.operators import auditlog as al


def test_audit_line_round_trip_recovers_fields(spark):
    ev = spark.createDataFrame(
        [
            (501, dt.datetime(2024, 1, 5, 9, 30, 0, 123456), 42, "purchase", 5.0, ""),
            (502, dt.datetime(2024, 1, 5, 9, 31, 0, 999999), 42, "error", 1.0, ""),
            (503, dt.datetime(2024, 1, 5, 9, 32, 0), 7, "view", 0.0, ""),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    parsed = {
        r.src: r
        for r in al.parse_audit_lines(al.format_audit_lines(ev)).collect()
    }
    create = parsed["/data/u42/f501"]
    assert (create.allowed, create.cmd, create.ugi) == ("true", "create", "user_2")
    assert create.perm == "user_2:supergroup:rwxr-xr-x"
    assert create.log_ts == "2024-01-05 09:30:00,123"  # millis truncated
    deny = parsed["/data/u42/f502"]
    assert (deny.allowed, deny.cmd, deny.perm) == ("false", "delete", "null")
    assert deny.log_ts == "2024-01-05 09:31:00,999"
    view = parsed["/data/u7/f503"]
    assert (view.cmd, view.dst, view.src_dir) == ("open", "null", "u7")


def test_audit_summary_counts(spark):
    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1), 5, "view", 0.0, ""),
            (2, dt.datetime(2024, 1, 2), 5, "view", 0.0, ""),
            (3, dt.datetime(2024, 1, 3), 45, "view", 0.0, ""),  # same ugi (mod 40)
            (4, dt.datetime(2024, 1, 4), 5, "error", 0.0, ""),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    rows = {
        (r.ugi, r.cmd): r
        for r in al.audit_summary(
            al.parse_audit_lines(al.format_audit_lines(ev))
        ).collect()
    }
    opens = rows[("user_5", "open")]
    assert (opens.n_ops, opens.n_allowed, opens.n_denied) == (3, 3, 0)
    assert opens.n_src_dirs == 2  # u5 and u45 collapse to one ugi, two dirs
    assert opens.first_ts.startswith("2024-01-01") and opens.last_ts.startswith("2024-01-03")
    assert rows[("user_5", "delete")].n_denied == 1


def test_class_stats_orthogonal_clusters(spark):
    # class 0 along x, class 1 along z: cohesion 1.0 (parallel vectors),
    # cross-centroid cosine ~0 — orthogonal classes confuse nothing.
    rows = [(i, [float(2 + i), 0.0, 0.0], 0) for i in range(4)]
    rows += [(10 + i, [0.0, 0.0, float(3 + i)], 1) for i in range(4)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in sim.class_stats(e).collect()}
    assert out[0].n == 4 and out[1].n == 4
    for lab in (0, 1):
        assert abs(out[lab].mean_cos_to_centroid - 1.0) < 1e-6
        assert abs(out[lab].min_cos_to_centroid - 1.0) < 1e-6
        assert abs(out[lab].nearest_centroid_cos) < 1e-6
    assert out[0].nearest_label == 1 and out[1].nearest_label == 0
