"""int8 embedding quantization: reconstruction error bounds and
quantized-search recall vs the exact float path."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hadoop_source_spark.data import table
from hadoop_source_spark.llmops import similarity as sim


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)


def test_quantize_roundtrip_error_bound(spark, emb):
    """Each component reconstructs within scale/2 = max|v|/254."""
    q = sim.quantize_embeddings(emb)
    joined = emb.join(q, "vec_id").select(
        "vec_id",
        F.array_max(
            F.zip_with(
                F.col("embedding"),
                sim.dequantize_expr(F.col("qvec"), F.col("scale")),
                lambda a, b: F.abs(a.cast("double") - b.cast("double")),
            )
        ).alias("max_err"),
        (F.col("scale").cast("double") * 0.5 + 1e-9).alias("bound"),
    )
    assert joined.filter(F.col("max_err") > F.col("bound")).count() == 0


def test_quantize_handles_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in sim.quantize_embeddings(df).collect()}
    assert list(rows[1].qvec) == [0, 0, 0] and rows[1].scale == 0.0
    assert list(rows[2].qvec) == [32, -64, 127]
    assert rows[2].scale == pytest.approx(4.0 / 127.0, rel=1e-6)


def test_quantized_topk_recall(spark, emb):
    """Quantized exact search recalls ≥ 0.9 of the float top-10 (64-dim
    unit-ish vectors lose ~log2(254) bits/component — ranking is
    essentially preserved)."""
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.brute_force_topk(emb, queries, k=10)
    quant = sim.brute_force_topk_quantized(
        sim.quantize_embeddings(emb), queries, k=10
    )
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    g = {(r.query_id, r.vec_id) for r in quant.collect()}
    assert len(e & g) / len(e) >= 0.9


def test_quantized_storage_is_smaller(spark, emb, tmp_path):
    """The claimed 4x: int8 codes + scale write materially smaller
    parquet than the float32 vectors (compression narrows the exact
    ratio; require >2x)."""
    import os

    fdir = str(tmp_path / "f32")
    qdir = str(tmp_path / "i8")
    emb.select("vec_id", "embedding").write.parquet(fdir)
    sim.quantize_embeddings(emb).write.parquet(qdir)

    def size(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    assert size(fdir) > 2 * size(qdir)
