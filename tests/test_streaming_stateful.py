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
