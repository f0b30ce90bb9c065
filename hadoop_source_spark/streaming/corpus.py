"""Continuously-ingesting corpus dedup — the streaming face of
``llmops.dedup.incremental_dedup``.

The shape a production training-data pipeline needs: documents arrive as
files in a landing directory; each micro-batch is deduped against the
accumulated canonical corpus through a slim persisted STATE table
(text_hash + minhash signature + shingle set per canonical doc,
``llmops.dedup.dedup_state``), survivors are appended to the clean-corpus
sink and their state rows appended to the state table. The corpus text is
never rescanned; per-batch cost is one signature pass over the batch plus
band equi-joins against the state.

Reference analog: this is the inotify-driven ingest loop
(hdfs-client/DFSInotifyEventInputStream.java:96) composed with the dedup
operators — the reference streams file events, we stream the files
themselves through Structured Streaming's file source, whose checkpoint
is the txid-style resume token.

Exactly-once: both sinks partition by ``ingest_batch`` and write with
dynamic partition overwrite, so a replayed micro-batch (after a crash,
before the checkpoint committed) rewrites its own partition instead of
double-appending; the state read prunes to ``ingest_batch < current`` so a
failed attempt's partial output is invisible to its own retry. This is
the parquet-sink idempotence pattern the event sinks in
``streaming/events.py`` use, applied to a read-modify-append state table.

At 100 TB: the state table is ~1% of corpus bytes (64 longs + gram
hashes + one md5 per doc vs full text), partitioned by arrival batch;
each stage's state read prunes to the columns it joins on (parquet
column pruning: text_hash for the exact stage, signature for the band
join, shset for verification). Compact old batch partitions with
``io.compact_parquet`` when micro-batches are small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_source_spark.llmops import dedup as dd

_BATCH_COL = "ingest_batch"


def state_schema(id_col: str = "doc_id", id_type: str = "long") -> str:
    """DDL schema of the persisted dedup state (dedup_state's output)."""
    return (
        f"{id_col} {id_type}, signature array<bigint>, "
        "shset array<bigint>, text_hash string"
    )


def _state_exists(spark: SparkSession, state_dir: str) -> bool:
    """Probe through the Hadoop FileSystem API so hdfs:///s3a:// state
    dirs behave like file:// — an os.path probe would silently report an
    empty state on any non-local scheme and re-admit every duplicate.

    The Py4J gateway (spark._jvm) is absent under Spark Connect; there we
    fall back to attempting the read itself, which is scheme-correct on
    the server side (AnalysisException ⇒ no state)."""
    try:
        jvm = spark._jvm
        jsc = spark._jsc
    except AttributeError:
        jvm = jsc = None
    if jvm is None or jsc is None:  # Spark Connect session
        from pyspark.errors import AnalysisException

        try:
            return bool(spark.read.parquet(state_dir).take(1))
        except AnalysisException:
            return False
    path = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = path.getFileSystem(jsc.hadoopConfiguration())
    if not fs.exists(path):
        return False
    for status in fs.listStatus(path):
        name = status.getPath().getName()
        if not name.startswith(("_", ".")):
            return True
    return False


def read_dedup_state(
    spark: SparkSession,
    state_dir: str,
    before_batch: int | None = None,
    id_col: str = "doc_id",
    id_type: str = "long",
) -> DataFrame:
    """The accumulated state table; empty (correct schema) before the
    first batch commits. ``before_batch`` prunes to state partitions
    written by earlier batches — a replayed batch must not see its own
    failed attempt's rows (partition pruning on ingest_batch makes the
    filter free)."""
    schema = state_schema(id_col, id_type)
    if not _state_exists(spark, state_dir):
        return spark.createDataFrame([], schema)
    df = spark.read.schema(schema + f", {_BATCH_COL} int").parquet(state_dir)
    if before_batch is not None:
        df = df.filter(F.col(_BATCH_COL) < before_batch)
    return df.drop(_BATCH_COL)


def _write_batch_partition(df: DataFrame, batch_id: int, out_dir: str) -> None:
    """Idempotent micro-batch write: dynamic overwrite of exactly this
    batch's partition."""
    (
        df.withColumn(_BATCH_COL, F.lit(int(batch_id)))
        .repartition(1)  # micro-batches are small; avoid file explosion
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(_BATCH_COL)
        .parquet(out_dir)
    )


def dedup_ingest_sink(
    state_dir: str,
    kept_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    id_type: str = "long",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
):
    """foreachBatch body for a dedup-on-ingest stream: dedup the
    micro-batch against the persisted state, append survivors to
    ``kept_dir`` and their state rows to ``state_dir``."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        state = read_dedup_state(
            spark, state_dir, before_batch=int(batch_id),
            id_col=id_col, id_type=id_type,
        )
        kept, delta = dd.incremental_dedup_delta(
            batch_df, state, text_col, id_col, num_hashes, bands,
            shingle_n, threshold,
        )
        # delta is derived from kept's plan; land it first, then write
        # kept from the already-checkpointed survivors (both stages sit
        # on eager localCheckpoints inside incremental_dedup_delta, so
        # neither write recomputes the LSH pipeline).
        _write_batch_partition(delta, batch_id, state_dir)
        _write_batch_partition(kept, batch_id, kept_dir)

    return _apply


def documents_file_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: str = "doc_id long, text string",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source document stream over a landing directory (new parquet
    file(s) = one micro-batch), the inotify-replay fixture shape."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )


def start_dedup_ingest(
    docs_stream: DataFrame,
    state_dir: str,
    kept_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **dedup_params,
):
    """Wire the stream to the dedup sink; availableNow=True drains the
    current landing-dir contents then stops (the batch-replay test mode),
    False runs continuously."""
    writer = (
        docs_stream.writeStream.foreachBatch(
            dedup_ingest_sink(state_dir, kept_dir, **dedup_params)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**({"availableNow": True} if available_now else {}))
    )
    return writer.start()
