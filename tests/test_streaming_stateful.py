"""Custom stateful operator (applyInPandasWithState) correctness: state
must accumulate across micro-batches and the final per-user totals must
equal the batch aggregate."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from hadoop_source_spark.streaming import events as se


def test_running_totals_accumulate_across_batches(spark):
    with tempfile.TemporaryDirectory() as d:
        se.replay_events_to_dir(spark, "/root/testdata/sf0.001", d, num_files=4)
        # one file per trigger → 4 micro-batches → state must carry over
        stream = se.events_stream(spark, d, max_files_per_trigger=1)
        out = se.run_to_memory(
            se.running_user_totals(stream), "t_state", output_mode="append"
        )
        # latest emission per user = final cumulative totals
        latest = (
            out.groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"),
                 F.max("last_event_us").alias("last_event_us"))
        )
        batch = (
            spark.read.parquet(d)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.max(F.unix_micros("ts")).alias("last_event_us"))
        )
        got = {r.user_id: (r.n_events, r.last_event_us) for r in latest.collect()}
        want = {r.user_id: (r.n_events, r.last_event_us) for r in batch.collect()}
        assert got == want
        # multiple emissions per user proves cross-batch statefulness
        multi = out.groupBy("user_id").count().filter(F.col("count") > 1).count()
        assert multi > 0


def test_streaming_cusum_equals_batch_kernel(spark):
    """The streaming restart-CUSUM (state machine across micro-batches)
    must produce the same post-warmup scores and alarms as the batch
    applyInPandas kernel over the same ordered buckets."""
    import math

    from hadoop_source_spark.operators import timeseries as tsr

    vals = {
        "a": [10, 11, 9, 10, 11, 9, 10] + [11.5] * 8 + [10, 10, 3, 10],
        "b": [5, 5, 5, 5, 5, 5, 5] + [5] * 10,
    }
    rows = [
        (s, i, float(v)) for s, vs in vals.items() for i, v in enumerate(vs)
    ]
    batch_df = spark.createDataFrame(
        rows, "series string, idx int, val double"
    )
    with tempfile.TemporaryDirectory() as d:
        # write idx chunks as SEPARATE appends with distinct mod times —
        # the file source orders by modification time, and part files
        # from one write share a timestamp (order would be undefined)
        import time

        for lo, hi in ((0, 5), (5, 10), (10, 15), (15, 20)):
            chunk = batch_df.filter(
                (F.col("idx") >= lo) & (F.col("idx") < hi)
            )
            chunk.coalesce(1).write.mode("append").parquet(d)
            time.sleep(1.1)
        stream = (
            spark.readStream.schema("series string, idx int, val double")
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        out = se.run_to_memory(
            se.cusum_stream(stream, warmup=7, k_scale=0.5, h_scale=2.0),
            "t_cusum_stream",
        )
        got = {
            (r.series, r.idx): r
            for r in out.filter(F.col("sp").isNotNull()).collect()
        }
    want = {
        (r.series, r.idx): r
        for r in tsr.cusum_detect(
            batch_df, warmup=7, k_scale=0.5, h_scale=2.0
        ).filter(F.col("sp").isNotNull()).collect()
    }
    assert set(got) == set(want) and got
    for k, w in want.items():
        g = got[k]
        assert g.alarm == w.alarm, k
        assert math.isclose(g.sp, w.sp, abs_tol=1e-9)
        assert math.isclose(g.sn, w.sn, abs_tol=1e-9)
        assert math.isclose(g.mu, w.mu, abs_tol=1e-9)
        assert math.isclose(g.sd, w.sd, abs_tol=1e-9)
    # and the planted drift actually alarmed in the stream
    assert any(r.alarm for r in got.values())
