"""Timestamp-footer robustness at the data seam.

The driver's testdata parquet has changed timestamp physical type across
rounds (TIMESTAMP(NANOS) → timestamp[us] without timezone, which Spark 4.x
reads as TIMESTAMP_NTZ).  Every timestamp-consuming operator family broke
once because ``unix_micros`` rejects TIMESTAMP_NTZ at analysis time.

This test writes the SAME events table with an NTZ footer and an LTZ
footer and asserts that ``data.table()`` normalizes both to plain
TIMESTAMP, and that the operator families that do timestamp arithmetic
(as-of join, range join, window gaps, micros extraction) analyze and run
on both — so the next silent footer change fails HERE, not in the driver.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from hadoop_source_spark import data
from hadoop_source_spark.operators.asof import asof_join
from hadoop_source_spark.operators.rangejoin import range_join

ROWS = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 0), 10, "click", 1.0),
    (2, datetime.datetime(2024, 1, 1, 0, 0, 30), 10, "purchase", 2.0),
    (3, datetime.datetime(2024, 1, 1, 0, 1, 0), 10, "click", 3.0),
    (4, datetime.datetime(2024, 1, 1, 0, 2, 0), 11, "click", 4.0),
    (5, datetime.datetime(2024, 1, 1, 0, 3, 0), 11, "purchase", 5.0),
]


def _write_events(dirpath, ts_type):
    arr = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in ROWS], ts_type),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
        }
    )
    pq.write_table(arr, str(dirpath / "events.parquet"))


@pytest.mark.parametrize(
    "flavor,ts_type",
    [
        ("ntz", pa.timestamp("us")),  # no tz → Spark would infer TIMESTAMP_NTZ
        ("ltz", pa.timestamp("us", tz="UTC")),  # tz-annotated → plain TIMESTAMP
    ],
)
def test_timestamp_footer_flavors_analyze_everywhere(spark, tmp_path, flavor, ts_type):
    d = tmp_path / flavor
    d.mkdir()
    _write_events(d, ts_type)
    e = data.table(spark, str(d), "events")

    # The seam contract: whatever the footer says, ts comes out plain TIMESTAMP.
    assert isinstance(e.schema["ts"].dataType, TimestampType), e.schema["ts"].dataType

    # unix_micros — the exact call that failed analysis in round 3.
    micros = e.select(F.unix_micros("ts").alias("us")).agg(F.min("us")).collect()[0][0]
    assert micros == 1704067200000000  # 2024-01-01T00:00:00Z

    # Window gap (lag over ts) — window_suite's broken branch.
    w = Window.partitionBy("user_id").orderBy("ts")
    gaps = (
        e.select(
            "user_id",
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        )
        .where(F.col("gap_us").isNotNull())
        .collect()
    )
    assert sorted(g.gap_us for g in gaps) == [30_000_000, 30_000_000, 60_000_000]

    # As-of join purchase→latest prior click — asof_purchase_click's kernel.
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    matched = asof_join(purchases, clicks, on="ts", by="user_id", direction="backward")
    got = {(r.purchase_id, r.click_id) for r in matched.collect()}
    assert got == {(2, 1), (5, 4)}

    # Range join (click within [purchase-60s, purchase]) — attribution kernel.
    probe = clicks.select("click_id", "user_id", F.unix_micros("ts").alias("c_us"))
    build = purchases.select(
        "purchase_id",
        F.col("user_id").alias("p_user"),
        (F.unix_micros("ts") - 60_000_000).alias("lo_us"),
        F.unix_micros("ts").alias("hi_us"),
    )
    rj = range_join(probe, build, on="c_us", lo="lo_us", hi="hi_us", chunk=60_000_000)
    assert rj.count() == 2

    # Streaming-style micros aggregation analyzes too (running-totals area).
    agg = e.groupBy("user_id").agg(F.max(F.unix_micros("ts")).alias("mx"))
    assert agg.count() == 2


def test_ntz_inference_disabled_in_tuned_session(spark, tmp_path):
    """Even a RAW spark.read.parquet through a tuned session must not
    surface TIMESTAMP_NTZ (conf-level guard, independent of data.table)."""
    d = tmp_path / "raw"
    d.mkdir()
    _write_events(d, pa.timestamp("us"))
    from hadoop_source_spark.session import tune

    tune(spark)
    raw = spark.read.parquet(str(d / "events.parquet"))
    assert isinstance(raw.schema["ts"].dataType, TimestampType)


def test_date32_footer_drift_normalizes_to_timestamp(spark, tmp_path):
    """If a future testdata generation stores a timestamp column as
    date32, the seam casts it to TIMESTAMP (midnight UTC) so
    unix_micros/interval arithmetic still analyzes — same incident
    class as the round-3 NTZ break, caught here first."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "date32"
    d.mkdir()
    arr = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)],
                pa.date32(),
            ),
            "user_id": pa.array([10, 10], pa.int64()),
            "event_type": pa.array(["click", "click"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    pq.write_table(arr, str(d / "events.parquet"))
    e = data.table(spark, str(d), "events")
    assert isinstance(e.schema["ts"].dataType, TimestampType)
    us = sorted(r.us for r in e.select(F.unix_micros("ts").alias("us")).collect())
    assert us[0] == 1704067200000000  # 2024-01-01T00:00:00Z


def test_decimal_price_footer_drift_still_analyzes(spark, tmp_path):
    """If a future testdata generation stores the TPC-H money columns as
    DECIMAL(15,2) (their canonical spec type) instead of double, every
    numeric pipeline must still analyze and execute — the decimal
    arithmetic path through q01's sum/avg/round chain is exercised
    end-to-end here. Same incident class as the round-3 NTZ break:
    footer type drift under an unchanged logical schema."""
    import decimal

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_source_spark import workload
    from hadoop_source_spark.data import table as load

    src = load(spark, "/root/testdata/sf0.001", "lineitem").limit(200)
    pdf = src.toPandas()
    cols = {}
    for name in pdf.columns:
        if name in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
            cols[name] = pa.array(
                [decimal.Decimal(str(round(v, 2))) for v in pdf[name]],
                pa.decimal128(15, 2),
            )
        elif name == "l_shipdate":
            cols[name] = pa.Array.from_pandas(
                pdf[name], type=pa.timestamp("us")
            )
        else:
            cols[name] = pa.Array.from_pandas(pdf[name])
    d = tmp_path / "dec"
    d.mkdir()
    pq.write_table(pa.table(cols), str(d / "lineitem.parquet"))
    out = workload.QUERIES["q01_pricing_summary"].fn(spark, str(d)).collect()
    assert 0 < len(out) <= 6
    assert all(r.sum_qty is not None for r in out)


def test_embedding_dtype_footer_drift_still_analyzes(spark, tmp_path):
    """If a future testdata generation stores embeddings as
    list<double> (or large_list) instead of list<float>, the vector
    pipelines must still analyze and produce the same neighbors — the
    similarity kernels cast to float64 internally, so only schema
    acceptance is at risk. Same incident class as the round-3 NTZ
    break: footer type drift under an unchanged logical schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from hadoop_source_spark.data import table as load
    from hadoop_source_spark.llmops import similarity as sim

    src = load(spark, "/root/testdata/sf0.001", "embeddings").limit(100)
    pdf = src.toPandas()
    for list_type in (
        pa.list_(pa.float64()),
        pa.large_list(pa.float32()),
    ):
        tbl = pa.table(
            {
                "vec_id": pa.Array.from_pandas(pdf["vec_id"]),
                "embedding": pa.array(
                    [list(v) for v in pdf["embedding"]], list_type
                ),
                "label": pa.Array.from_pandas(pdf["label"]),
            }
        )
        d = tmp_path / str(list_type).replace("<", "_").replace(">", "_")
        d.mkdir()
        pq.write_table(tbl, str(d / "embeddings.parquet"))
        emb = load(spark, str(d), "embeddings")
        q = emb.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = sim.brute_force_topk(emb, q, k=5).collect()
        assert len(out) == 10  # 2 queries x top-5
        # self-match first: identical vector ⇒ cosine 1.0 at rank 1
        top1 = {r.query_id: r.vec_id for r in out if r.rank == 1}
        assert top1 == {0: 0, 1: 1}
