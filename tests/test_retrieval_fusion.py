"""knn_classify and rrf_fuse semantics on planted inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_source_spark.llmops import similarity as sim


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_knn_classify_separable_clusters(spark):
    # two orthogonal clusters; queries sit inside one each → unanimous.
    train = _vecs(
        spark,
        [(i, [10.0 + i, 1.0, 0.0], 0) for i in range(5)]
        + [(10 + i, [0.0, 1.0, 10.0 + i], 1) for i in range(5)],
    )
    q = spark.createDataFrame(
        [(100, [20.0, 1.0, 0.1]), (101, [0.1, 1.0, 20.0])],
        "query_id long, embedding array<float>",
    )
    out = {r.query_id: r for r in sim.knn_classify(train, q, k=5).collect()}
    assert out[100].pred_label == 0 and out[100].votes == 5
    assert out[101].pred_label == 1 and out[101].votes == 5


def test_knn_classify_vote_tiebreak_smallest_label(spark):
    # k=4 split 2-2 between labels 7 and 3 → winner is label 3.
    train = _vecs(
        spark,
        [
            (1, [1.0, 0.0], 7),
            (2, [0.98, 0.02], 7),
            (3, [0.97, 0.03], 3),
            (4, [0.96, 0.04], 3),
        ],
    )
    q = spark.createDataFrame(
        [(9, [1.0, 0.0])], "query_id long, embedding array<float>"
    )
    r = sim.knn_classify(train, q, k=4).collect()[0]
    assert (r.pred_label, r.votes) == (3, 2)


def test_rrf_fuse_scores_and_outer_candidates(spark):
    # doc 1 ranks 1st in both lists; doc 2 only sparse; doc 3 only dense.
    a = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 1, 1), (0, 3, 2)], "query_id long, doc_id long, rank int"
    )
    out = {r.doc_id: r for r in sim.rrf_fuse(a, b, rrf_k=60, top_k=10).collect()}
    assert set(out) == {1, 2, 3}
    assert abs(out[1].rrf_score - round(2 / 61, 6)) < 1e-9
    assert abs(out[2].rrf_score - round(1 / 62, 6)) < 1e-9
    assert out[1].fused_rank == 1
    # both single-list docs share 1/62 → id tiebreak orders doc 2 first
    assert out[2].fused_rank == 2 and out[3].fused_rank == 3
    assert out[2].rank_b is None and out[3].rank_a is None


def test_rrf_fuse_respects_top_k(spark):
    a = spark.createDataFrame(
        [(0, i, i) for i in range(1, 9)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 100 + i, i) for i in range(1, 9)],
        "query_id long, doc_id long, rank int",
    )
    out = sim.rrf_fuse(a, b, rrf_k=60, top_k=5)
    assert out.count() == 5
    assert out.agg(F.max("fused_rank")).collect()[0][0] == 5
