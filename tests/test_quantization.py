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


@pytest.fixture(scope="module")
def pq_state(spark, emb):
    books = sim.pq_codebooks(emb, m=16, ksub=32)
    codes = sim.pq_encode(emb, books).localCheckpoint(eager=True)
    return books, codes


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def test_pq_refined_recall_vs_brute_force(spark, emb, pq_state):
    """PQ + exact refine of the 10x shortlist must recover >= 0.9 of the
    true cosine top-10 (the standard ADC+refine pipeline quality bar)."""
    books, codes = pq_state
    q = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = _topk_sets(sim.brute_force_topk(emb, q, k=10))
    ref = _topk_sets(sim.pq_topk(codes, q, books, k=10, refine=10, corpus=emb))
    hits = sum(len(exact[qid] & ref.get(qid, set())) for qid in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.9
    # pure ADC (no refine) is coarser but must stay well above chance
    adc = _topk_sets(sim.pq_topk(codes, q, books, k=10))
    adc_hits = sum(len(exact[qid] & adc.get(qid, set())) for qid in exact)
    assert adc_hits / total >= 0.3


def test_pq_codes_deterministic_and_bounded(spark, emb, pq_state):
    """Seeded training + sorted-limit sample: re-training yields
    identical codebooks and codes; every code < ksub."""
    import numpy as np

    books, codes = pq_state
    books2 = sim.pq_codebooks(emb, m=16, ksub=32)
    assert np.array_equal(books, books2)
    rows = codes.collect()
    assert all(0 <= c < 32 for r in rows for c in r.codes)
    # m codes per vector, corpus fully covered
    assert all(len(r.codes) == 16 for r in rows)
    assert len(rows) == emb.count()


def test_pq_storage_shrinks(spark, emb, pq_state, tmp_path):
    """The persisted code table must be far smaller than the float
    corpus — the reason PQ exists."""
    import os

    books, codes = pq_state
    d1 = str(tmp_path / "float");  d2 = str(tmp_path / "codes")
    emb.select("vec_id", "embedding").write.parquet(d1)
    codes.write.parquet(d2)

    def sz(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d) if f.endswith(".parquet")
        )
    assert sz(d2) * 4 < sz(d1)  # ≥4x smaller on disk (16 B codes vs 256 B)


def test_ivfpq_matches_ivf_ceiling(spark, emb):
    """IVF-PQ (coarse cells + residual PQ + ADC + refine) must lose
    NOTHING to quantization: with the same cells/nprobe its recall
    equals plain IVF's (the cell-probe ceiling) — the property that
    makes the billion-vector layout safe: probing bounds WHICH vectors
    you read, PQ only bounds what each one costs."""
    q = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = _topk_sets(sim.brute_force_topk(emb, q, k=10))
    ivfpq = _topk_sets(sim.ivfpq_topk(
        emb, q, k=10, num_cells=8, nprobe=3, m=16, ksub=32, refine=10
    ))
    ivf = _topk_sets(sim.ivf_topk(emb, q, k=10, num_cells=8, nprobe=3))

    def recall(approx):
        hits = sum(len(exact[qid] & approx.get(qid, set())) for qid in exact)
        return hits / sum(len(v) for v in exact.values())

    r_pq, r_ivf = recall(ivfpq), recall(ivf)
    assert r_pq >= r_ivf - 1e-9        # quantization costs zero recall
    assert r_ivf >= 0.5                # sane probe ceiling at 3/8 cells
    # deterministic end to end (seeded trainers, stable tie-breaks)
    again = _topk_sets(sim.ivfpq_topk(
        emb, q, k=10, num_cells=8, nprobe=3, m=16, ksub=32, refine=10
    ))
    assert again == ivfpq
