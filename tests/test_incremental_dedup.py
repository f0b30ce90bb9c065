"""Incremental (batch-vs-corpus) dedup and BPE-ish token counting."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hadoop_source_spark.llmops import dedup as dd
from hadoop_source_spark.llmops import textstats as ts


@pytest.fixture(scope="module")
def corpus_and_batch(spark):
    """Corpus (ids 0-4, already canonical) + a new batch (ids 10-16):
    exact copy, near copy, fresh, batch-internal dup pair, short doc."""
    mk = lambda i, t: (i, t)
    base = [
        mk(0, "the quick brown fox jumps over the lazy dog again and again"),
        mk(1, "pack my box with five dozen liquor jugs before noon today ok"),
        mk(2, "sphinx of black quartz judge my vow said the old librarian"),
        mk(3, "how vexingly quick daft zebras jump over fences in the park"),
        mk(4, "a completely different document about distributed query engines"),
    ]
    batch = [
        # exact copy of 0 -> dropped by exact stage
        mk(10, "the quick brown fox jumps over the lazy dog again and again"),
        # near copy of 1 (one word changed) -> dropped by LSH-vs-corpus
        mk(11, "pack my box with five dozen liquor jugs before noon tonight ok"),
        # fresh
        mk(12, "entirely novel content that matches nothing in the corpus at all"),
        # batch-internal near-dup pair -> min id 13 survives, 14 dropped
        mk(13, "spark catalyst optimizes logical plans into physical plans fast"),
        mk(14, "spark catalyst optimizes logical plans into physical plans quickly"),
        # exact batch-internal dup of 12 -> dropped (min id 12 wins)
        mk(15, "entirely novel content that matches nothing in the corpus at all"),
        # fresh
        mk(16, "completely unrelated text on sorting networks and merge trees"),
    ]
    schema = "doc_id long, text string"
    return (
        spark.createDataFrame(base, schema),
        spark.createDataFrame(batch, schema),
    )


def test_incremental_dedup_semantics(spark, corpus_and_batch):
    corpus, batch = corpus_and_batch
    state = dd.dedup_state(corpus)
    kept, new_state = dd.incremental_dedup(batch, state, threshold=0.5)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert kept_ids == {12, 13, 16}
    state_ids = {r.doc_id for r in new_state.select("doc_id").collect()}
    assert state_ids == {0, 1, 2, 3, 4, 12, 13, 16}
    assert new_state.columns == state.columns


def test_incremental_dedup_idempotent(spark, corpus_and_batch):
    """Replaying the same batch against the updated state keeps nothing:
    previously-kept docs are exact-hash hits, previously-dropped docs are
    still duplicates."""
    corpus, batch = corpus_and_batch
    state = dd.dedup_state(corpus)
    _, new_state = dd.incremental_dedup(batch, state, threshold=0.5)
    new_state = new_state.localCheckpoint(eager=True)
    kept2, state2 = dd.incremental_dedup(batch, new_state, threshold=0.5)
    assert kept2.count() == 0
    assert state2.count() == new_state.count()


def test_incremental_matches_full_batch_when_ids_ordered(spark):
    """When corpus ids < batch ids and no transitive chains span the
    boundary, incremental dedup == full-batch dedup restricted to the
    batch (min-id canonicalization makes corpus rows win either way)."""
    texts = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "one two three four five six seven eight nine ten eleven"),
        (10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # dup of 0
        (11, "one two three four five six seven eight nine ten twelve"),  # near 1
        (12, "fresh content with no relation to anything else here at all"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    corpus = df.filter(F.col("doc_id") < 10)
    batch = df.filter(F.col("doc_id") >= 10)

    # full-batch ground truth on corpus ∪ batch
    exact_keep = dd.exact_dedup(df, "text", "doc_id").select("doc_id")
    pairs = dd.minhash_lsh_verified_pairs(df, "text", "doc_id", threshold=0.5)
    non_canon = (
        dd.dedup_clusters(pairs)
        .filter(F.col("node") != F.col("cluster"))
        .select(F.col("node").alias("doc_id"))
    )
    full_keep = {
        r.doc_id
        for r in exact_keep.join(non_canon, "doc_id", "left_anti").collect()
    }

    kept, _ = dd.incremental_dedup(batch, dd.dedup_state(corpus), threshold=0.5)
    inc_keep = {r.doc_id for r in kept.collect()}
    assert inc_keep == {i for i in full_keep if i >= 10}


def test_token_count_bpe_pieces(spark):
    """BPE-ish piece counting: contractions split, letter/digit/punct runs
    each one piece, whitespace never counted as a piece."""
    rows = [
        (1, "Hello world"),          # 'Hello', ' world'
        (2, "it's 2024!"),           # 'it', ''s', ' 2024', '!'
        (3, ""),                     # 0
        (4, "a-b"),                  # 'a', '-', 'b'
        (5, "  spaced   out  "),     # ' spaced', ' out'
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: r.n
        for r in df.select(
            "id", ts.token_count_bpe(F.col("text")).alias("n")
        ).collect()
    }
    assert got == {1: 2, 2: 4, 3: 0, 4: 3, 5: 2}


def test_token_count_bpe_matches_duckdb(spark, sf_dir):
    """The Spark regex and the DuckDB oracle regex count identically over
    the real documents table (this is what makes n_tokens_bpe a
    hash-verifiable doc_profile column)."""
    import os

    import duckdb

    from hadoop_source_spark.data import table

    d = table(spark, sf_dir, "documents")
    spark_counts = {
        r.doc_id: r.n
        for r in d.select(
            "doc_id", ts.token_count_bpe(F.col("text")).alias("n")
        ).collect()
    }
    con = duckdb.connect()
    duck = con.execute(
        "SELECT doc_id, len(regexp_extract_all(text, "
        r"'''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+')) "
        f"FROM read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    ).fetchall()
    assert spark_counts == {i: n for i, n in duck}


def test_band_bucket_cap_bounds_boilerplate(spark):
    """A corpus of near-identical boilerplate docs explodes the band
    self-join quadratically; bucket_cap drops the hot buckets and keeps
    the pair count bounded while distinct near-dup pairs elsewhere
    survive."""
    boiler = [
        (i, "identical boilerplate legal disclaimer text repeated verbatim")
        for i in range(40)
    ]
    pair = [
        (100, "one genuinely real near duplicate document pair lives quite "
              "happily inside this little test corpus today"),
        (101, "one genuinely real near duplicate document pair lives quite "
              "happily inside this little test corpus tonight"),
    ]
    df = spark.createDataFrame(boiler + pair, "doc_id long, text string")
    capped = dd.minhash_lsh_verified_pairs(
        df, threshold=0.5, bucket_cap=10
    ).collect()
    got = {(r.id_a, r.id_b) for r in capped}
    assert (100, 101) in got
    # every boilerplate bucket exceeds the cap in all bands -> no 40x40 blowup
    assert all(a >= 100 for a, _ in got)
    # uncapped control: the boilerplate clique is quadratic
    full = dd.minhash_lsh_verified_pairs(df, threshold=0.5).count()
    assert full >= 40 * 39 / 2
