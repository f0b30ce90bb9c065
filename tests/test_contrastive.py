"""Contrastive-pair mining pins on planted separable clusters."""

from __future__ import annotations

import numpy as np

from hadoop_source_spark.llmops import similarity as sim


def _corpus(spark):
    # three orthogonal-ish clusters: label = axis, small within-cluster
    # jitter. cross-cluster cosine ~0, within ~1.
    rng = np.random.RandomState(0)
    rows = []
    for vid in range(30):
        label = vid % 3
        v = np.zeros(8)
        v[label] = 1.0
        v += 0.01 * rng.randn(8)
        rows.append((vid, [float(x) for x in v], label))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_mining_separates_positives_and_hard_negatives(spark):
    corpus = _corpus(spark)
    from pyspark.sql import functions as F

    q = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    out = sim.mine_contrastive_pairs(corpus, q, k_pos=3, k_neg=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        pos = [r for r in rows if r.pair_type == "positive"]
        neg = [r for r in rows if r.pair_type == "hard_negative"]
        assert len(pos) == 3 and len(neg) == 2
        assert all(r.label == r.query_label for r in pos)
        assert all(r.label != r.query_label for r in neg)
        assert all(r.vec_id != qid for r in rows)  # self excluded
        # planted geometry: every positive far closer than any negative
        assert min(r.cosine for r in pos) > max(r.cosine for r in neg)
        # ranks are 1..k within each side
        assert sorted(r.rank for r in pos) == [1, 2, 3]
        assert sorted(r.rank for r in neg) == [1, 2]
