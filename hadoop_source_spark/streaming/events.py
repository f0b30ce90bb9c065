"""Event-stream processing — the HDFS inotify surface, Spark-first.

Reference semantics being reproduced:
- DFSInotifyEventInputStream (hdfs-client/DFSInotifyEventInputStream.java:96
  poll, :207 take): an ordered, resumable stream of typed events with a
  txid offset. Spark analog: a file-source stream + checkpointing — the
  checkpoint's file/offset log IS the txid resume token.
- tail -f (common/fs/shell/Tail.java:53-93, 5s poll loop): micro-batch
  file-source follow.
- Durable append visibility (DFSOutputStream.hflush/hsync :577,:584):
  sink-side exactly-once via checkpoint + idempotent foreachBatch.

The reference has NO windows/watermarks/session state; we expose Spark's
(window, session_window, withWatermark, dropDuplicates) because the
north-star engine needs them, and verify them by batch-replay equivalence
(tests) — stream(availableNow) over the same data must equal the batch
query.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def replay_events_to_dir(spark: SparkSession, sf_dir: str, out_dir: str,
                         num_files: int = 8) -> None:
    """Materialize the events table as N parquet files so the file source
    replays it as N discoverable 'appends' (micro-batches with
    maxFilesPerTrigger=1) — the inotify-replay fixture."""
    from hadoop_source_spark.data import table

    (
        table(spark, sf_dir, "events")
        .repartitionByRange(num_files, F.col("event_id"))
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def events_stream(spark: SparkSession, events_dir: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """readStream over an events directory (schema pinned — streaming
    sources don't infer)."""
    reader = (
        spark.readStream.schema(EVENT_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(events_dir)


def hourly_counts_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h window counts with late-data tolerance `watermark`.
    State is bounded: windows older than the watermark are finalized and
    evicted — the 100 TB/unbounded-time safety property."""
    return (
        stream.withWatermark("ts", watermark)
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


# Typed inotify event classification. hdfs-client/inotify/Event.java
# exposes SEVEN event classes: CreateEvent(:102), CloseEvent(:37),
# AppendEvent(:270), RenameEvent(:491), MetadataUpdateEvent(:316),
# UnlinkEvent(:610), TruncateEvent(:656). The synthetic feed has five
# event_type values, so two of them are subdivided by the parity of the
# `k` key every props JSON carries: an error either removed the file
# (UNLINK) or shortened it (TRUNCATE); a view either touched metadata
# (METADATA_UPDATE) or moved the path (RENAME). Unknown types classify
# as OTHER rather than dropping.
INOTIFY_CLASS = {
    "signup": "CREATE",
    "purchase": "CLOSE",
    "click": "APPEND",
    "error": "UNLINK",
    "view": "METADATA_UPDATE",
}

# (event_type, k is odd) → the subdivided class; even/missing k keeps the
# base class above.
INOTIFY_CLASS_ODD = {
    "error": "TRUNCATE",
    "view": "RENAME",
}


def classify_events(
    col: Column | str = "event_type", props: Column | str | None = None
) -> Column:
    """Event.EventType classifier column (works on streams and batches —
    a pure CASE projection, JVM-side json path extraction).

    With ``props`` given, emits the full 7-class surface
    (RenameEvent/TruncateEvent included); without it, the 5 base classes.
    """
    src = F.col(col) if isinstance(col, str) else col
    c = F.lit("OTHER")
    for k in sorted(INOTIFY_CLASS, reverse=True):
        c = F.when(src == k, F.lit(INOTIFY_CLASS[k])).otherwise(c)
    if props is not None:
        p = F.col(props) if isinstance(props, str) else props
        k_odd = F.get_json_object(p, "$.k").cast("bigint") % 2 == 1
        for t in sorted(INOTIFY_CLASS_ODD, reverse=True):
            c = F.when(
                (src == t) & k_odd, F.lit(INOTIFY_CLASS_ODD[t])
            ).otherwise(c)
    return c


def typed_event_counts_stream(
    stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Typed event classification + tumbling 1h windowed per-class counts:
    the DFSInotifyEventInputStream consumer loop (poll → switch on
    getEventType() → per-type handling) as a declarative watermarked
    streaming agg. Bounded state: windows older than the watermark are
    finalized and evicted."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour"),
            classify_events(props="props").alias("event_class"),
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


def sessionize_stream(stream: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Session windows over the stream — merging windows with gap timeout,
    exactly the batch session_window semantics."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
        )
    )


def dedup_stream(stream: DataFrame, keys: list[str] | None = None,
                 watermark: str = "2 hours") -> DataFrame:
    """Stateful stream dedup within the watermark horizon — the inotify
    at-least-once → exactly-once bridge (resume may replay events; state
    drops txid duplicates, watermark bounds the state)."""
    return stream.withWatermark("ts", watermark).dropDuplicates(
        keys or ["event_id"]
    )


def tail_follow(spark: SparkSession, dir_path: str) -> DataFrame:
    """tail -f (Tail.java:53): follow a growing text directory as a
    micro-batch stream of lines."""
    return spark.readStream.format("text").load(dir_path)


def purchase_click_interval_join(
    purchases: DataFrame,
    clicks: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM inner join: each purchase matched to same-user clicks
    within `max_gap` BEFORE it. Both sides watermarked so the join state
    is bounded (clicks older than purchase-watermark − max_gap are
    evicted) — the unbounded-time safety property a 100 TB stream needs.

    Batch equivalence is asserted in tests (availableNow drain == batch
    range-join on the same data)."""
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", watermark)
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {max_gap}")),
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        "click_id",
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """CUSTOM STATEFUL OPERATOR via applyInPandasWithState: per-user
    running totals that survive across micro-batches — the operator class
    Spark's built-ins don't cover (arbitrary per-key state machines; the
    reference's closest analog is the edit-log tailer keeping its own
    resume state, FSEditLog.java:124).

    Emits one row per (user) per batch it appears in, with cumulative
    n_events / sum_value / last event timestamp. State is a 3-field
    tuple; watermark-less (state lives for the query lifetime — bound it
    with timeoutConf for production TTLs)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total, last_us = (
            state.get if state.exists else (0, 0.0, 0)
        )
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last_us = max(
                last_us, int(pdf["ts"].astype("int64").max() // 1000)
            )
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [round(total, 4)],
                "last_event_us": [last_us],
            }
        )

    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, sum_value double, "
                             "last_event_us long",
            stateStructType="n long, total double, last_us long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cusum_stream(
    stream: DataFrame,
    warmup: int = 7,
    k_scale: float = 0.5,
    h_scale: float = 2.0,
) -> DataFrame:
    """STREAMING restart-CUSUM (the stateful twin of operators/
    timeseries.cusum_detect): per-series drift detection whose
    accumulators survive across micro-batches via
    applyInPandasWithState — the arbitrary-state operator class, like
    running_user_totals but with a real sequential state machine
    (warmup moment collection → frozen baseline → sp/sn fold with
    reset-on-alarm).

    State is five scalars (n, sum, sumsq, sp, sn): the warmup baseline
    freezes once `warmup` buckets arrived, so no buffer is kept — the
    sample std comes from the moment identity (ss - n·mu²)/(n-1).
    Requires in-order delivery per series (ordered replay / sorted
    upstream); out-of-order feeds need a watermark+sort front end.
    Input columns: series, idx, val. Output mirrors the batch kernel
    (null scores during warmup)."""
    import math

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, s, ss, sp, sn = (
            state.get if state.exists else (0, 0.0, 0.0, 0.0, 0.0)
        )
        idxs, vals, mus, sds, sps, sns, alarms = ([] for _ in range(7))
        for pdf in pdfs:
            pdf = pdf.sort_values("idx")
            for idx, x in zip(pdf["idx"], pdf["val"]):
                x = float(x)
                if n < warmup:
                    n += 1
                    s += x
                    ss += x * x
                    row = (None, None, None, None, None)
                else:
                    mu = s / warmup
                    var = max(0.0, (ss - warmup * mu * mu) / (warmup - 1))
                    sd = math.sqrt(var)
                    kk = k_scale * sd
                    h = h_scale * sd
                    spr = max(0.0, sp + (x - mu - kk))
                    snr = max(0.0, sn + (mu - x - kk))
                    alarm = bool(spr > h or snr > h)
                    sp, sn = (0.0, 0.0) if alarm else (spr, snr)
                    row = (mu, sd, spr, snr, alarm)
                idxs.append(int(idx))
                vals.append(x)
                mus.append(row[0])
                sds.append(row[1])
                sps.append(row[2])
                sns.append(row[3])
                alarms.append(row[4])
        state.update((n, s, ss, sp, sn))
        yield pd.DataFrame(
            {
                "series": key[0],
                "idx": idxs,
                "val": vals,
                "mu": mus,
                "sd": sds,
                "sp": sps,
                "sn": sns,
                "alarm": alarms,
            }
        )

    return (
        stream.select("series", "idx", "val")
        .groupBy("series")
        .applyInPandasWithState(
            update,
            outputStructType="series string, idx int, val double, "
                             "mu double, sd double, sp double, "
                             "sn double, alarm boolean",
            stateStructType="n long, s double, ss double, sp double, "
                            "sn double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(stream_df: DataFrame, name: str,
                  output_mode: str = "append") -> DataFrame:
    """Drain a stream with availableNow into an in-memory table and return
    the result as a batch DataFrame (test/verification harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def heavy_hitters_stream(
    stream: DataFrame,
    capacity: int,
    group_col: str = "grp",
    key_col: str = "key",
) -> DataFrame:
    """Streaming heavy hitters per group via the Misra-Gries summary
    (Misra & Gries 1982, "Finding repeated elements" — the classic
    bounded-state frequent-items sketch; SpaceSaving is its sibling):
    the state holds at most `capacity` (key, count) counters; a new
    key increments its counter, takes a free slot if any, and
    otherwise DECREMENTS every counter (dropping zeros) — guaranteeing
    every true count is under-counted by at most N/capacity, and any
    key with frequency > N/(capacity+1) is present.

    Third arbitrary-state operator in this engine (after
    running_user_totals and cusum_stream): state = parallel key/count
    arrays + a batch sequence, carried across micro-batches by
    applyInPandasWithState. With capacity >= distinct keys the sketch
    degenerates to EXACT counting (that deterministic regime is the
    driver query's oracle-checked slice; the lossy regime's error
    bound is pytest-gated). Emits the counter table after every
    micro-batch tagged with the batch sequence; downstream keeps the
    last batch per group for the final answer."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{group_col} string, {key_col} string, cnt long, batch long"
    )
    state_schema = (
        "keys array<string>, counts array<long>, batch long"
    )

    def fold(grp_key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            keys, counts, batch = state.get
            counters = dict(zip(keys, counts))
        else:
            counters, batch = {}, 0
        for pdf in pdf_iter:
            for k in pdf[key_col]:
                k = str(k)
                if k in counters:
                    counters[k] += 1
                elif len(counters) < capacity:
                    counters[k] = 1
                else:
                    for kk in list(counters):
                        counters[kk] -= 1
                        if counters[kk] == 0:
                            del counters[kk]
        batch += 1
        state.update((list(counters), [int(v) for v in counters.values()],
                      batch))
        yield pd.DataFrame(
            {
                group_col: [grp_key[0]] * len(counters),
                key_col: list(counters),
                "cnt": [int(v) for v in counters.values()],
                "batch": [batch] * len(counters),
            }
        )

    return (
        stream.groupBy(group_col)
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
