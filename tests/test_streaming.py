"""Streaming correctness by batch-replay equivalence: a stream drained
with availableNow over the same data must equal the batch query
(the reference's inotify ordering/resume tests are the model —
hdfs-test/TestDFSInotifyEventInputStream.java)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from hadoop_source_spark.streaming import events as se


@pytest.fixture(scope="module")
def events_dir(spark):
    with tempfile.TemporaryDirectory() as d:
        se.replay_events_to_dir(spark, "/root/testdata/sf0.001", d, num_files=4)
        yield d


def test_stream_sees_all_events(spark, events_dir):
    stream = se.events_stream(spark, events_dir)
    out = se.run_to_memory(stream.select("event_id"), "t_all_events")
    batch = spark.read.parquet(events_dir)
    assert out.count() == batch.count()


def test_hourly_counts_match_batch(spark, events_dir):
    # complete mode: append would (correctly) hold back windows newer than
    # the watermark when the availableNow run ends — we want all of them.
    stream = se.events_stream(spark, events_dir)
    out = se.run_to_memory(
        se.hourly_counts_stream(stream), "t_hourly", output_mode="complete"
    )
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_typed_counts_match_batch(spark, events_dir):
    """Typed inotify-class classification (Event.java analog) over the
    stream equals the same classification + window agg run as a batch."""
    stream = se.events_stream(spark, events_dir)
    out = se.run_to_memory(
        se.typed_event_counts_stream(stream), "t_typed", output_mode="complete"
    )
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(
            F.window("ts", "1 hour"),
            se.classify_events(props="props").alias("event_class"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_class",
            "n_events",
            "sum_value",
        )
    )
    got = sorted(map(tuple, out.collect()))
    assert got == sorted(map(tuple, batch.collect()))
    # ALL SEVEN Event.java classes appear (RenameEvent/TruncateEvent come
    # from the props-parity subdivision of view/error)
    classes = {r[1] for r in got}
    assert classes == {
        "CREATE", "CLOSE", "APPEND", "UNLINK", "METADATA_UPDATE",
        "RENAME", "TRUNCATE",
    }


def test_dedup_stream_drops_replays(spark, events_dir):
    """Replay duplicates (inotify resume) are dropped by keyed state."""
    stream = se.events_stream(spark, events_dir)
    doubled = stream.unionByName(stream)  # simulate a replayed source
    out = se.run_to_memory(
        se.dedup_stream(doubled, keys=["event_id"]), "t_dedup"
    )
    batch = spark.read.parquet(events_dir)
    assert out.count() == batch.count()


def test_stream_stream_interval_join_matches_batch(spark, events_dir):
    """Stream-stream join drained with availableNow must equal the batch
    range join over the same data."""
    stream = se.events_stream(spark, events_dir)
    p_s = stream.filter(F.col("event_type") == "purchase")
    c_s = stream.filter(F.col("event_type") == "click")
    out = se.run_to_memory(
        se.purchase_click_interval_join(p_s, c_s), "t_ssjoin"
    )
    batch = spark.read.parquet(events_dir)
    pb = batch.filter(F.col("event_type") == "purchase").selectExpr(
        "event_id AS purchase_id", "user_id AS p_user", "ts AS p_ts"
    )
    cb = batch.filter(F.col("event_type") == "click").selectExpr(
        "event_id AS click_id", "user_id AS c_user", "ts AS c_ts"
    )
    want = (
        pb.join(
            cb,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        )
        .select("purchase_id", "click_id")
    )
    got = {(r.purchase_id, r.click_id) for r in out.select("purchase_id", "click_id").collect()}
    expected = {(r.purchase_id, r.click_id) for r in want.collect()}
    assert got == expected and len(expected) > 0


def test_checkpoint_resume_processes_only_new_data(spark):
    """inotify txid resume (DFSInotifyEventInputStream.java:45): restart
    from a checkpoint must process only events appended after the last
    offset — the checkpoint IS the resume token."""
    import os

    with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as ckpt, tempfile.TemporaryDirectory() as sink:
        df = spark.range(10).selectExpr("id", "timestamp'2024-01-01' as ts")
        df.coalesce(1).write.mode("append").parquet(src)

        def run_once():
            stream = (
                spark.readStream.schema("id long, ts timestamp")
                .format("parquet").load(src)
            )
            q = (
                stream.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_once()
        n1 = spark.read.parquet(sink).count()
        assert n1 == 10
        # append 5 more and resume from the same checkpoint
        spark.range(100, 105).selectExpr(
            "id", "timestamp'2024-01-02' as ts"
        ).coalesce(1).write.mode("append").parquet(src)
        run_once()
        out = spark.read.parquet(sink)
        assert out.count() == 15  # 10 + 5, NOT 25 — no reprocessing
        assert out.filter("id >= 100").count() == 5


def test_foreach_batch_idempotent_sink(spark):
    """hflush/hsync durability analog: foreachBatch + batchId-keyed
    idempotent writes give exactly-once output."""
    seen = {}

    def sink(batch_df, batch_id):
        # idempotent: keyed by batch_id, re-delivery overwrites same key
        seen[batch_id] = batch_df.count()

    with tempfile.TemporaryDirectory() as d:
        se.replay_events_to_dir(spark, "/root/testdata/sf0.001", d, num_files=3)
        stream = se.events_stream(spark, d, max_files_per_trigger=1)
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert sum(seen.values()) == spark.read.parquet(d).count()
        assert len(seen) >= 2  # genuinely micro-batched


def test_tail_follow_picks_up_appends(spark):
    """tail -f: new files appearing in the dir arrive as new micro-batches."""
    import os

    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "a.txt"), "w") as f:
            f.write("line1\nline2\n")
        stream = se.tail_follow(spark, d)
        q = (
            stream.writeStream.format("memory").queryName("t_tail")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        n1 = spark.sql("SELECT count(*) FROM t_tail").collect()[0][0]
        assert n1 == 2
        # "append" more (new file = the file-source growth model)
        with open(os.path.join(d, "b.txt"), "w") as f:
            f.write("line3\n")
        q2 = (
            se.tail_follow(spark, d)
            .writeStream.format("memory").queryName("t_tail2")
            .trigger(availableNow=True).start()
        )
        q2.awaitTermination()
        n2 = spark.sql("SELECT count(*) FROM t_tail2").collect()[0][0]
        assert n2 == 3


def test_stream_static_broadcast_join(spark, events_dir):
    """Stream-static join: a streaming fact source enriched against a
    static dimension (the classic lookup-on-ingest). The static side is
    re-read per micro-batch by Structured Streaming; broadcast keeps it
    off the shuffle path. Drained result must equal the batch join."""
    static_dim = F.broadcast(
        spark.read.parquet(events_dir)
        .select("user_id").distinct()
        .withColumn("tier", F.when(F.col("user_id") % 3 == 0, "gold")
                    .otherwise("standard"))
    )
    stream = se.events_stream(spark, events_dir)
    enriched = (
        stream.join(static_dim, "user_id")
        .groupBy("tier", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = se.run_to_memory(enriched, "t_static_join", output_mode="complete")
    batch = (
        spark.read.parquet(events_dir)
        .join(static_dim, "user_id")
        .groupBy("tier", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_audit_rates_update_mode_evicts_state(spark):
    """ADVICE pin: audit_rates_stream in UPDATE mode really enforces the
    watermark — a line arriving 2h+ late (vs the checkpointed watermark)
    is dropped and its window is never re-emitted. Complete mode (the
    driver's batch-equivalence row) retains all windows by design; this
    is the bounded-state path."""
    import datetime as dt

    from hadoop_source_spark.operators import auditlog as al

    emitted = []

    def run_once(src, ckpt):
        stream = se.events_stream(spark, src)
        parsed = al.parse_audit_lines(
            al.format_audit_lines(stream), carry=("ts",)
        )
        rates = al.audit_rates_stream(parsed, watermark="2 hours")

        def sink(batch_df, _bid):
            emitted.extend(tuple(r) for r in batch_df.collect())

        q = (
            rates.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    def ev(eid, hour, minute, uid, etype):
        return (
            eid, dt.datetime(2024, 1, 1, hour, minute), uid, etype, 1.0, "{}"
        )

    with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as ckpt:
        batch1 = [ev(1, 0, 10, 1, "view"), ev(2, 0, 20, 1, "view"),
                  ev(3, 10, 0, 2, "purchase")]
        spark.createDataFrame(batch1, se.EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        run_once(src, ckpt)
        h0 = [r for r in emitted if r[0].startswith("2024-01-01 00")]
        assert h0 and h0[0][3] == 2  # hour-0 window emitted once, n_ops=2

        # restart from the checkpoint (watermark restored: 10:00 - 2h =
        # 08:00) with one line back at hour 0 → dropped, not re-emitted.
        emitted.clear()
        spark.createDataFrame(
            [ev(4, 0, 30, 1, "view")], se.EVENT_SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
        q = run_once(src, ckpt)
        assert not [r for r in emitted if r[0].startswith("2024-01-01 00")]
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        )
        assert dropped >= 1
