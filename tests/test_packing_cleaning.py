"""Sequence packing, PII redaction/normalization, deterministic epoch
shuffle — the training-data last-mile operators."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest

from hadoop_source_spark.llmops import packing as pk
from hadoop_source_spark.llmops import sampling as sp
from hadoop_source_spark.llmops import textstats as ts


# ---------------------------------------------------------------------------
# PII redaction / normalization
# ---------------------------------------------------------------------------

PII_ROWS = [
    (1, "contact john.doe+spam@example.co.uk or visit https://ex.com/a?b=c now"),
    (2, "call +1 555 123 4567 or 310-555-0199 from 10.0.0.1 please"),
    (3, "no pii here at all, just words and 42 numbers"),
    (4, "mixed: http://a.b/c@d.com then admin@host.io and 192.168.1.255 end"),
    (5, ""),
]


def _py_redact(text: str) -> str:
    for _, pattern, token in ts.PII_PATTERNS:
        text = re.sub(pattern, token, text)
    return text


def test_redact_pii_matches_python_re(spark):
    df = spark.createDataFrame(PII_ROWS, "id long, text string")
    got = {
        r.id: r.red
        for r in df.select(
            "id", ts.redact_pii(F.col("text")).alias("red")
        ).collect()
    }
    assert got == {i: _py_redact(t) for i, t in PII_ROWS}
    # the spans really are gone
    assert "@" not in got[1] and "https://" not in got[1]
    assert "555" not in got[2] and "10.0.0.1" not in got[2]
    assert got[3] == PII_ROWS[2][1]  # untouched


def test_pii_counts(spark):
    df = spark.createDataFrame(PII_ROWS, "id long, text string")
    row = (
        df.filter(F.col("id") == 2)
        .select(*ts.pii_counts(F.col("text")))
        .collect()[0]
    )
    assert row.n_pii_phone == 2 and row.n_pii_ipv4 == 1
    assert row.n_pii_email == 0 and row.n_pii_url == 0


def test_redact_clean_corpus_is_noop(spark, sf_dir):
    """The synthetic documents table has no PII-shaped spans — redaction
    must be an exact no-op over real data (no spurious matches)."""
    from hadoop_source_spark.data import table

    d = table(spark, sf_dir, "documents")
    changed = d.filter(
        ts.redact_pii(F.col("text")) != F.col("text")
    ).count()
    assert changed == 0


def test_normalize_text(spark):
    df = spark.createDataFrame(
        [(1, "  Hello\t\tWORLD \n again  ")], "id long, text string"
    )
    got = df.select(ts.normalize_text(F.col("text")).alias("t")).collect()[0].t
    assert got == "hello world again"


# ---------------------------------------------------------------------------
# tokenize + pack
# ---------------------------------------------------------------------------


def test_tokenize_ids_in_vocab_and_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "Hello world, it's 2024!"), (2, "Hello world, it's 2024!")],
        "doc_id long, text string",
    )
    toks = pk.tokenize(df, vocab_size=1000).collect()
    t1, t2 = (sorted(toks, key=lambda r: r.doc_id)[i].tokens for i in (0, 1))
    assert t1 == t2  # same text -> same ids
    assert all(0 <= t < 1000 for t in t1)
    # piece count equals the BPE token counter on the same text
    n = df.select(ts.token_count_bpe(F.col("text")).alias("n")).collect()[0].n
    assert len(t1) == n


@pytest.fixture(scope="module")
def packed(spark, sf_dir):
    from hadoop_source_spark.data import table

    docs = table(spark, sf_dir, "documents").repartition(4, "doc_id")
    toks = pk.tokenize(docs).localCheckpoint(eager=True)
    out = pk.pack_sequences(toks, seq_len=128, eod_id=-1).localCheckpoint(
        eager=True
    )
    return toks, out


def test_packing_conserves_tokens(spark, packed):
    toks, out = packed
    total_in = toks.select(
        F.sum(F.size("tokens")).alias("n")
    ).collect()[0].n
    n_docs = toks.count()
    total_out = out.select(F.sum("n_tokens").alias("n")).collect()[0].n
    assert total_out == total_in + n_docs  # one eod token per doc


def test_packing_shape_and_ids(spark, packed):
    _, out = packed
    rows = out.collect()
    assert all(len(r.input_ids) == 128 for r in rows)
    assert all(r.n_tokens <= 128 for r in rows)
    assert len({r.seq_id for r in rows}) == len(rows)  # globally unique
    # padding only on partial rows, with pad_id
    for r in rows:
        assert all(t == 0 for t in r.input_ids[r.n_tokens:])


def test_packing_efficiency(spark, packed):
    """Greedy packing wastes at most one partial sequence per partition:
    fill ratio stays high."""
    _, out = packed
    rows = out.select("n_tokens").collect()
    fill = sum(r.n_tokens for r in rows) / (len(rows) * 128)
    assert fill > 0.9


def test_packing_order_within_doc(spark):
    """A document's tokens appear in order, contiguously across sequence
    boundaries (long doc split over several rows)."""
    df = spark.createDataFrame(
        [(7, list(range(1, 301)))], "doc_id long, tokens array<int>"
    ).coalesce(1)
    rows = sorted(
        pk.pack_sequences(df, seq_len=100).collect(), key=lambda r: r.seq_id
    )
    stream = [t for r in rows for t in r.input_ids[: r.n_tokens]]
    assert stream == list(range(1, 301))
    assert all(r.doc_ids == [7] for r in rows)


# ---------------------------------------------------------------------------
# deterministic epoch shuffle
# ---------------------------------------------------------------------------


def test_deterministic_shuffle(spark, sf_dir):
    from hadoop_source_spark.data import table

    d = table(spark, sf_dir, "documents").select("doc_id")
    o1 = [r.doc_id for r in sp.deterministic_shuffle(d, seed=1).collect()]
    o2 = [
        r.doc_id
        for r in sp.deterministic_shuffle(
            d.repartition(13), seed=1
        ).collect()
    ]
    o3 = [r.doc_id for r in sp.deterministic_shuffle(d, seed=2).collect()]
    assert o1 == o2  # partitioning-invariant
    assert o1 != o3  # epochs differ
    assert sorted(o1) == sorted(o3)  # both are permutations
    assert o1 != sorted(o1)  # actually shuffled


# ---------------------------------------------------------------------------
# property-based: packing invariants under random corpora
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.integers(1, 1000), min_size=0, max_size=70),
        min_size=1,
        max_size=30,
    ),
    seq_len=st.sampled_from([16, 32, 64]),
    eod=st.sampled_from([None, -1]),
)
def test_packing_invariants_random(spark, docs, seq_len, eod):
    """For any corpus and seq_len: (a) the concatenated non-pad token
    stream per partition equals the input docs' streams in order, (b)
    every row is exactly seq_len wide, (c) n_tokens accounts for eod
    markers."""
    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<int>"
    ).coalesce(1)
    out = sorted(
        pk.pack_sequences(df, seq_len=seq_len, eod_id=eod).collect(),
        key=lambda r: r.seq_id,
    )
    stream = [t for r in out for t in r.input_ids[: r.n_tokens]]
    want = []
    for _, d in rows:
        want.extend(d)
        if eod is not None:
            want.append(eod)
    assert stream == want
    assert all(len(r.input_ids) == seq_len for r in out)
    total = sum(len(d) for d in docs) + (len(docs) if eod is not None else 0)
    assert sum(r.n_tokens for r in out) == total


def test_tfidf_top_terms_semantics(spark):
    """The doc-specific term outranks corpus-wide terms; ubiquitous terms
    get idf ln(1)=0."""
    from hadoop_source_spark.llmops import textstats as ts

    df = spark.createDataFrame(
        [(1, "common common zebra"),
         (2, "common yak yak"),
         (3, "common plain words")],
        "doc_id long, text string",
    )
    rows = ts.tf_idf_top_terms(df, top_k=1).collect()
    top = {r.doc_id: (r.term, r.tfidf) for r in rows}
    assert top[1][0] == "zebra" and top[2][0] == "yak"
    # 'common' appears in all 3 docs -> tfidf exactly 0 everywhere
    all_rows = ts.tf_idf_top_terms(df, top_k=10).collect()
    assert all(r.tfidf == 0.0 for r in all_rows if r.term == "common")
    # doc 2: tf('yak')=2, df=1 -> 2*ln(3)
    import math
    yak = next(r for r in all_rows if r.term == "yak")
    assert abs(yak.tfidf - round(2 * math.log(3), 6)) < 1e-9


def test_decontaminate_flags_overlap_only(spark):
    from hadoop_source_spark.llmops import textstats as ts

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    corpus = spark.createDataFrame(
        [(1, f"prefix words {shared} suffix words"),
         (2, "completely unrelated training document with other content here"),
         (3, "short doc")],
        "doc_id long, text string",
    )
    heldout = spark.createDataFrame(
        [(100, f"the eval question mentions {shared} verbatim")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_hits for r in
           ts.decontaminate(corpus, heldout, ngram_n=8).collect()}
    # doc 1 shares the 9-word run -> two distinct 8-grams; others clean
    assert got == {1: 2}
    # n-gram longer than every doc -> nothing flagged, no crash
    assert ts.decontaminate(corpus, heldout, ngram_n=50).count() == 0
