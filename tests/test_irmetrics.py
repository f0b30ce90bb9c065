"""ranking_metrics on planted inputs with hand-computed expectations."""

from __future__ import annotations

import math

from hadoop_source_spark.llmops.irmetrics import ranking_metrics


def test_metrics_hand_computed(spark):
    # query 1: ranked docs 10,20,30; relevant {20:g2, 30:g1, 40:g3, 50:g1}
    ranked = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3),
         (2, 10, 1), (2, 20, 2)],          # query 2: no relevant docs
        "query_id int, doc_id int, rank int")
    rels = spark.createDataFrame(
        [(1, 20, 2), (1, 30, 1), (1, 40, 3), (1, 50, 1)],
        "query_id int, doc_id int, grade int")
    out = {r["query_id"]: r.asDict()
           for r in ranking_metrics(ranked, rels, k=10).collect()}
    q1 = out[1]
    assert q1["n_rel"] == 4 and q1["n_hits"] == 2
    assert q1["recall_at_k"] == 0.5
    assert q1["mrr"] == 0.5  # first hit at rank 2
    dcg = (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    idcg = ((2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3)
            + (2**1 - 1) / math.log2(4) + (2**1 - 1) / math.log2(5))
    assert q1["ndcg_at_k"] == round(dcg / idcg, 6)
    # AP: hits at ranks 2 (prec 1/2) and 3 (prec 2/3); denom min(4,10)=4
    assert q1["ap_at_k"] == round((0.5 + 2 / 3) / 4, 6)
    q2 = out[2]
    assert (q2["n_rel"], q2["n_hits"]) == (0, 0)
    assert (q2["recall_at_k"], q2["mrr"], q2["ndcg_at_k"],
            q2["ap_at_k"]) == (0.0, 0.0, 0.0, 0.0)


def test_metrics_perfect_ranking(spark):
    ranked = spark.createDataFrame(
        [(1, 40, 1), (1, 20, 2), (1, 30, 3), (1, 50, 4)],
        "query_id int, doc_id int, rank int")
    rels = spark.createDataFrame(
        [(1, 40, 3), (1, 20, 2), (1, 30, 1), (1, 50, 1)],
        "query_id int, doc_id int, grade int")
    r = ranking_metrics(ranked, rels, k=10).collect()[0]
    assert r["recall_at_k"] == 1.0
    assert r["mrr"] == 1.0
    assert r["ndcg_at_k"] == 1.0  # ideal order (ties by doc_id match)
    assert r["ap_at_k"] == 1.0


def test_metrics_cutoff(spark):
    # rows past k are ignored entirely
    ranked = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)],
        "query_id int, doc_id int, rank int")
    rels = spark.createDataFrame(
        [(1, 30, 2)], "query_id int, doc_id int, grade int")
    r = ranking_metrics(ranked, rels, k=2).collect()[0]
    assert (r["n_hits"], r["mrr"], r["recall_at_k"]) == (0, 0.0, 0.0)
