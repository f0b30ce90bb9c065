"""Concat-and-chunk pins (GPT-style decoder pretraining stream)."""

from __future__ import annotations

from collections import defaultdict

from hadoop_source_spark.llmops import packing as pk


def _run(spark, weights, seq_len):
    df = spark.createDataFrame(
        [(i, n, i) for i, n in enumerate(weights)],
        "doc_id long, n_tokens long, shuffle_key long",
    )
    return pk.concat_and_chunk(df, seq_len=seq_len).collect()


def test_conservation_and_contiguity(spark):
    weights = [5, 12, 3, 9, 20, 1]
    rows = _run(spark, weights, seq_len=8)
    assert sum(r["piece_len"] for r in rows) == sum(weights)
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    for doc, pieces in by_doc.items():
        pieces.sort(key=lambda r: r["piece_start"])
        # pieces tile the doc's token stream [0, n) without gaps
        pos = 0
        for p in pieces:
            assert p["piece_start"] == pos
            pos += p["piece_len"]
        assert pos == weights[doc]
        # exactly the final piece carries the EOD
        assert [p["has_eod"] for p in pieces] == [False] * (
            len(pieces) - 1
        ) + [True]


def test_sequences_full_except_last(spark):
    weights = [5, 12, 3, 9, 20, 1]   # total 50, seq_len 8 -> 7 seqs
    rows = _run(spark, weights, seq_len=8)
    per_seq = defaultdict(int)
    for r in rows:
        per_seq[r["seq_id"]] += r["piece_len"]
    seqs = sorted(per_seq)
    assert seqs == list(range(len(seqs)))
    assert all(per_seq[s] == 8 for s in seqs[:-1])
    assert per_seq[seqs[-1]] == 50 - 8 * (len(seqs) - 1)


def test_long_doc_spans_boundaries(spark):
    rows = _run(spark, [20], seq_len=8)
    assert sorted(r["seq_id"] for r in rows) == [0, 1, 2]
    first = next(r for r in rows if r["seq_id"] == 0)
    assert first["seq_pos"] == 0 and first["piece_len"] == 8


def test_order_follows_shuffle_key(spark):
    # reversed shuffle keys reverse the stream order
    df = spark.createDataFrame(
        [(0, 4, 9), (1, 4, 1)], "doc_id long, n_tokens long,"
        " shuffle_key long"
    )
    rows = pk.concat_and_chunk(df, seq_len=100).collect()
    got = {r["doc_id"]: r["seq_pos"] for r in rows}
    assert got == {1: 0, 0: 4}


def test_zero_token_docs_are_dropped_not_exploded(spark):
    # a doc with n_tokens <= 0 violates the "includes EOD" contract;
    # it must vanish (contribute no pieces and shift no offsets), not
    # emit a DESCENDING sequence of bogus pieces
    df = spark.createDataFrame(
        [(0, 5, 0), (1, 0, 1), (2, -3, 2), (3, 7, 3)],
        "doc_id long, n_tokens long, shuffle_key long",
    )
    rows = pk.concat_and_chunk(df, seq_len=8).collect()
    assert {r["doc_id"] for r in rows} == {0, 3}
    assert sum(r["piece_len"] for r in rows) == 12
    assert all(r["piece_len"] > 0 for r in rows)
    # offsets are as if the zero/negative docs never existed
    per_seq = sorted(r["seq_id"] for r in rows)
    assert per_seq == [0, 0, 1]


def test_embedding_decontaminate_planted(spark):
    from hadoop_source_spark.llmops import similarity as sim

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),    # exact copy of bench 100
            (2, [0.9, 0.1, 0.0]),    # near copy
            (3, [0.0, 0.0, 1.0]),    # orthogonal to both
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r
        for r in sim.embedding_decontaminate(
            corpus, bench, threshold=0.95
        ).collect()
    }
    assert got[1]["contaminated"] and got[1]["benchmark_id"] == 100
    assert got[1]["cosine"] == 1.0
    assert got[2]["contaminated"]          # 0.9939 >= 0.95
    assert got[2]["benchmark_id"] == 100   # argmax, not just any hit
    assert not got[3]["contaminated"]
    assert got[3]["cosine"] == 0.0
