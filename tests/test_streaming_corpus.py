"""Streaming dedup-on-ingest: the foreachBatch incremental-dedup loop
over a file-source document stream must equal sequential batch
incremental dedup, be idempotent under batch replay, and keep the state
table append-only."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from hadoop_source_spark.llmops import dedup as dd
from hadoop_source_spark.streaming import corpus as sc


DOCS = [
    # landing file 0 — the initial corpus
    [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "pack my box with five dozen liquor jugs before noon today ok"),
        (2, "a completely different document about distributed query engines"),
    ],
    # landing file 1 — exact dup of 0, near dup of 1, one fresh
    [
        (10, "the quick brown fox jumps over the lazy dog again and again"),
        (11, "pack my box with five dozen liquor jugs before noon tonight ok"),
        (12, "entirely novel content that matches nothing in the corpus at all"),
    ],
    # landing file 2 — exact dup of 12 (prior batch!), internal near pair
    [
        (20, "entirely novel content that matches nothing in the corpus at all"),
        (21, "spark catalyst optimizes logical plans into physical plans fast"),
        (22, "spark catalyst optimizes logical plans into physical plans quickly"),
    ],
]
SCHEMA = "doc_id long, text string"


def _write_landing(spark, landing, batches):
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(landing, f"b{i}"))


def _drain(spark, landing, root):
    state_dir = os.path.join(root, "state")
    kept_dir = os.path.join(root, "kept")
    ckpt = os.path.join(root, "ckpt")
    q = sc.start_dedup_ingest(
        sc.documents_file_stream(spark, os.path.join(landing, "*")),
        state_dir, kept_dir, ckpt, threshold=0.5,
    )
    q.awaitTermination()
    return state_dir, kept_dir, ckpt


def test_stream_equals_sequential_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    _write_landing(spark, landing, DOCS)
    state_dir, kept_dir, _ = _drain(spark, landing, str(tmp_path))

    kept_ids = {
        r.doc_id for r in spark.read.parquet(kept_dir).select("doc_id").collect()
    }
    # sequential batch ground truth
    state = spark.createDataFrame([], sc.state_schema())
    expect = set()
    for rows in DOCS:
        batch = spark.createDataFrame(rows, SCHEMA)
        kept, state = dd.incremental_dedup(batch, state, threshold=0.5)
        state = state.localCheckpoint(eager=True)
        expect |= {r.doc_id for r in kept.select("doc_id").collect()}
    assert kept_ids == expect
    # spot-check semantics: dups of earlier batches dropped across files
    assert {10, 11, 20, 22}.isdisjoint(kept_ids)
    assert {0, 1, 2, 12, 21} <= kept_ids

    # state table mirrors the kept corpus and carries the slim columns
    st = spark.read.parquet(state_dir)
    assert {r.doc_id for r in st.select("doc_id").collect()} == kept_ids
    assert set(st.columns) == {
        "doc_id", "signature", "shset", "text_hash", "ingest_batch"
    }


def test_restart_is_exactly_once(spark, tmp_path):
    """Re-running the drained stream with the same checkpoint discovers
    no new files and changes nothing; adding a file processes ONLY it."""
    landing = str(tmp_path / "landing")
    _write_landing(spark, landing, DOCS)
    state_dir, kept_dir, ckpt = _drain(spark, landing, str(tmp_path))
    before = spark.read.parquet(kept_dir).count()

    q = sc.start_dedup_ingest(
        sc.documents_file_stream(spark, os.path.join(landing, "*")),
        state_dir, kept_dir, ckpt, threshold=0.5,
    )
    q.awaitTermination()
    assert spark.read.parquet(kept_dir).count() == before

    # a new landing file with one dup-of-state and one fresh doc
    spark.createDataFrame(
        [(30, DOCS[0][0][1]), (31, "genuinely new closing document here ok")],
        SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(landing, "b3")
    )
    q = sc.start_dedup_ingest(
        sc.documents_file_stream(spark, os.path.join(landing, "*")),
        state_dir, kept_dir, ckpt, threshold=0.5,
    )
    q.awaitTermination()
    after = {
        r.doc_id for r in spark.read.parquet(kept_dir).select("doc_id").collect()
    }
    assert 30 not in after and 31 in after
    assert len(after) == before + 1


def test_replayed_batch_overwrites_its_partition(spark, tmp_path):
    """Simulate a crash-replay: run the same batch_id twice through the
    sink body directly — output and state must be identical to one run
    (dynamic partition overwrite + before_batch state pruning)."""
    state_dir = str(tmp_path / "state")
    kept_dir = str(tmp_path / "kept")
    sink = sc.dedup_ingest_sink(state_dir, kept_dir, threshold=0.5)
    b0 = spark.createDataFrame(DOCS[0], SCHEMA)
    b1 = spark.createDataFrame(DOCS[1], SCHEMA)
    sink(b0, 0)
    sink(b1, 1)
    once = sorted(
        r.doc_id for r in spark.read.parquet(kept_dir).select("doc_id").collect()
    )
    sink(b1, 1)  # replay
    twice = sorted(
        r.doc_id for r in spark.read.parquet(kept_dir).select("doc_id").collect()
    )
    assert once == twice
    st = spark.read.parquet(state_dir)
    assert st.count() == st.select("doc_id").distinct().count()


def test_empty_state_read(spark, tmp_path):
    empty = sc.read_dedup_state(spark, str(tmp_path / "missing"))
    assert empty.count() == 0
    assert empty.columns == ["doc_id", "signature", "shset", "text_hash"]


def test_streaming_cms_maintenance_equals_batch(spark, tmp_path):
    """Count-min sketch maintained incrementally over a file stream
    (foreachBatch: sketch-of-batch, monoid-merged into durable state)
    == the sketch built over the whole corpus in one batch — the
    mergeability that makes the sketch streamable and shardable."""
    from hadoop_source_spark.functions import cms

    landing = str(tmp_path / "landing")
    batches = [
        [(i, "x") for i in range(30)],
        [(i % 7, "x") for i in range(40)],
        [(i % 3, "x") for i in range(20)],
    ]
    _write_landing(spark, landing, batches)
    state_dir = str(tmp_path / "cms_state")
    W, D = 64, 3

    def upd(batch_df, batch_id):
        delta = cms.cms_build(batch_df, "doc_id", width=W, depth=D)
        try:
            prior = batch_df.sparkSession.read.parquet(state_dir)
            merged = cms.cms_merge(prior, delta)
        except Exception:
            merged = delta
        merged.coalesce(1).write.mode("overwrite").parquet(state_dir + ".next")
        # atomic-ish swap for the test: rewrite state from .next
        batch_df.sparkSession.read.parquet(state_dir + ".next").coalesce(
            1
        ).write.mode("overwrite").parquet(state_dir)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(landing, "*"))
    )
    q = stream.writeStream.foreachBatch(upd).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination()

    streamed = {
        (r.seed, r.slot): r.cnt
        for r in spark.read.parquet(state_dir).collect()
    }
    full = spark.createDataFrame(
        [x for b in batches for x in b], SCHEMA
    )
    batch_sketch = {
        (r.seed, r.slot): r.cnt
        for r in cms.cms_build(full, "doc_id", width=W, depth=D).collect()
    }
    assert streamed == batch_sketch
    probes = full.select("doc_id").distinct()
    est = {
        r.doc_id: r.est
        for r in cms.cms_estimate(
            spark.read.parquet(state_dir), probes, "doc_id", width=W, depth=D
        ).collect()
    }
    exact = {
        r.doc_id: r["count"] for r in full.groupBy("doc_id").count().collect()
    }
    assert all(est[k] >= exact[k] for k in exact)


def test_streaming_kll_store_maintenance(spark, tmp_path):
    """KLL quantile store maintained incrementally over a file stream
    (foreachBatch: sketch-of-batch, merge_stores into durable state):
    the final state's quantiles honor the same rank guarantee as a
    batch-built store over the full corpus — mergeability makes the
    percentile state streamable exactly like the CMS/HLL stores."""
    import pyspark.sql.functions as F

    from hadoop_source_spark.functions import kll

    VSCHEMA = "grp string, value double"
    landing = str(tmp_path / "landing")
    rows = [("a", float(i)) for i in range(400)] + [
        ("b", float(i * i % 97)) for i in range(300)
    ]
    batches = [rows[:250], rows[250:500], rows[500:]]
    for i, b in enumerate(batches):
        spark.createDataFrame(b, VSCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(landing, f"b{i}"))
    state_dir = str(tmp_path / "kll_state")

    def upd(batch_df, batch_id):
        delta = kll.quantile_store(batch_df, ["grp"], "value")
        try:
            prior = batch_df.sparkSession.read.parquet(state_dir)
            merged = kll.merge_stores(prior, delta, ["grp"])
        except Exception:
            merged = delta
        merged.coalesce(1).write.mode("overwrite").parquet(state_dir + ".next")
        batch_df.sparkSession.read.parquet(state_dir + ".next").coalesce(
            1
        ).write.mode("overwrite").parquet(state_dir)

    stream = (
        spark.readStream.schema(VSCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(landing, "*"))
    )
    q = stream.writeStream.foreachBatch(upd).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination()

    state = spark.read.parquet(state_dir)
    full = spark.createDataFrame(rows, VSCHEMA)
    # row counts conserved per group
    n_state = {r.grp: r.n_rows for r in state.collect()}
    n_full = {
        r.grp: r.n for r in full.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert n_state == n_full
    # median from streamed state honors the rank bound on the full data
    for r in kll.quantiles(state, ["grp"], [0.5]).collect():
        sub = [v for g, v in rows if g == r.grp]
        lo = sum(1 for v in sub if v < r.q_0_5) / len(sub)
        hi = sum(1 for v in sub if v <= r.q_0_5) / len(sub)
        assert lo <= 0.53 and hi >= 0.47, r.grp
