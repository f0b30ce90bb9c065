"""T5 span-corruption pins (Raffel et al. 2020 §3.1.4 objective;
deterministic arithmetic-bucket variant per the fim.py convention)."""

from __future__ import annotations

from hadoop_source_spark.llmops import spancorrupt

TEN = " ".join(f"t{i}" for i in range(10))


def _run(spark, rows):
    out = spancorrupt.span_corrupt(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()
    return {r["doc_id"]: r for r in out}


def test_hand_computed_spans(spark):
    got = _run(spark, [(2, TEN), (1, TEN)])
    # doc 2: window 0 corrupted, s=62%8=6, len=min(3, 2)=2 -> t6 t7
    r = got[2]
    assert r["n_spans"] == 1
    assert r["input_text"] == "t0 t1 t2 t3 t4 t5 <extra_id_0> t8 t9"
    assert r["target_text"] == "<extra_id_0> t6 t7"
    # doc 1: window 1 corrupted, s=48%8=0, len=min(3, tail 2)=2
    r = got[1]
    assert r["input_text"] == "t0 t1 t2 t3 t4 t5 t6 t7 <extra_id_1>"
    assert r["target_text"] == "<extra_id_1> t8 t9"


def test_short_tail_dodges_draw(spark):
    # doc 7, 9 tokens: window 1 eligible but s=2 >= tail length 1
    nine = " ".join(f"t{i}" for i in range(9))
    r = _run(spark, [(7, nine)])[7]
    assert r["n_spans"] == 0
    assert r["input_text"] == nine
    assert r["target_text"] == ""


def test_empty_and_whitespace_docs(spark):
    got = _run(spark, [(2, ""), (4, "   ")])
    for did in (2, 4):
        assert got[did]["n_tokens"] == 0
        assert got[did]["n_spans"] == 0
        assert got[did]["input_text"] == ""
        assert got[did]["target_text"] == ""


def test_reconstruction_invariant(spark, sf_dir):
    # input tokens (sans sentinels) + target span tokens == original
    from hadoop_source_spark.data import table

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).limit(50)
    out = spancorrupt.span_corrupt(docs).collect()
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out:
        toks = [t for t in orig[r["doc_id"]].split() if t]
        inp = r["input_text"].split()
        tgt = r["target_text"].split()
        # splice targets back in by sentinel id
        spans: dict[str, list[str]] = {}
        cur = None
        for t in tgt:
            if t.startswith("<extra_id_"):
                cur = t
                spans[cur] = []
            else:
                spans[cur].append(t)
        rebuilt: list[str] = []
        for t in inp:
            if t.startswith("<extra_id_"):
                rebuilt.extend(spans[t])
            else:
                rebuilt.append(t)
        assert rebuilt == toks, r["doc_id"]
        assert r["n_spans"] == len(spans)
