"""mmr_rerank pinned against a hand-written NumPy greedy reference."""

from __future__ import annotations

import numpy as np

from hadoop_source_spark.llmops.similarity import mmr_rerank


def _reference(docs, rel, vecs, k, lam):
    m = np.array(vecs, dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    rel = np.array(rel, dtype=np.float64)
    order = np.argsort(docs)  # ascending-id layout = tiebreak order
    docs = [docs[i] for i in order]
    rel = rel[order]
    sims = sims[np.ix_(order, order)]
    selected, remaining = [], list(range(len(docs)))
    out = []
    for _ in range(min(k, len(docs))):
        if selected:
            red = sims[np.ix_(remaining, selected)].max(axis=1)
            mmr = lam * rel[remaining] - (1 - lam) * red
        else:
            mmr = lam * rel[remaining]
        j = int(np.argmax(mmr))
        out.append((docs[remaining[j]], round(float(mmr[j]), 6)))
        selected.append(remaining.pop(j))
    return out


def _run(spark, rows, vecs, k=3, lam=0.7):
    ranked = spark.createDataFrame(
        [(1, d, r) for d, r in rows], "query_id long, doc_id long,"
        " score double")
    vectors = spark.createDataFrame(
        [(d, v) for d, v in vecs.items()],
        "doc_id long, embedding array<float>")
    got = (mmr_rerank(ranked, vectors, k=k, lam=lam)
           .orderBy("mmr_rank").collect())
    return [(r["doc_id"], r["mmr_score"]) for r in got]


def test_mmr_penalizes_redundancy(spark):
    # doc 10 and 20 are near-identical; 30 is orthogonal with lower
    # relevance. Pure relevance order would pick 10, 20; MMR picks 30
    # second because 20 is redundant with 10.
    vecs = {10: [1.0, 0.0], 20: [0.999, 0.045], 30: [0.0, 1.0]}
    rows = [(10, 1.0), (20, 0.95), (30, 0.6)]
    got = _run(spark, rows, vecs, k=3, lam=0.5)
    assert [d for d, _ in got] == [10, 30, 20]
    expect = _reference([10, 20, 30], [1.0, 0.95, 0.6],
                        [vecs[10], vecs[20], vecs[30]], 3, 0.5)
    assert got == expect


def test_mmr_lambda_one_is_pure_relevance(spark):
    vecs = {10: [1.0, 0.0], 20: [1.0, 0.0], 30: [0.0, 1.0]}
    rows = [(10, 0.3), (20, 0.9), (30, 0.6)]
    got = _run(spark, rows, vecs, k=3, lam=1.0)
    assert [d for d, _ in got] == [20, 30, 10]


def test_mmr_matches_reference_on_random_inputs(spark):
    rng = np.random.RandomState(7)
    docs = list(range(100, 110))
    vecs = {d: rng.randn(8).tolist() for d in docs}
    rel = {d: float(rng.rand()) for d in docs}
    rows = [(d, rel[d]) for d in docs]
    got = _run(spark, rows, vecs, k=5, lam=0.7)
    expect = _reference(docs, [rel[d] for d in docs],
                        [vecs[d] for d in docs], 5, 0.7)
    # float32 storage of embeddings introduces ~1e-7 noise vs the
    # float64 reference; compare picks exactly and scores loosely
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (_, a), (_, b) in zip(got, expect):
        assert abs(a - b) < 1e-5


def test_mmr_k_exceeds_shortlist(spark):
    vecs = {10: [1.0, 0.0], 20: [0.0, 1.0]}
    got = _run(spark, [(10, 0.9), (20, 0.8)], vecs, k=5)
    assert len(got) == 2
