"""Distributed PCA gates: exact moments, orthonormal basis, variance
capture on planted low-rank data, deterministic signs, zero-shuffle
projection plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hadoop_source_spark.llmops import similarity as sim


def _df(spark, x, parts=4):
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(parts, "vec_id")


def _planted(n=400, d=16, rank=3, noise=1e-3, seed=7):
    rng = np.random.RandomState(seed)
    basis, _ = np.linalg.qr(rng.randn(d, rank))
    scales = np.array([10.0, 5.0, 2.0])
    x = (rng.randn(n, rank) * scales) @ basis.T
    x += noise * rng.randn(n, d)
    x += rng.randn(d)  # nonzero mean — the fit must center
    return x.astype(np.float32)


def test_pca_moments_match_numpy_exactly(spark):
    x = _planted()
    mean, comps, ratio = sim.pca_fit(_df(spark, x), k=4)
    np.testing.assert_allclose(mean, np.asarray(x, np.float64).mean(0),
                               rtol=0, atol=1e-9)
    # covariance eigenvalues == numpy's, through the distributed moments
    xc = np.asarray(x, np.float64)
    cov = np.cov(xc, rowvar=False, bias=True)
    ev = np.sort(np.linalg.eigvalsh(cov))[::-1][:4]
    got = ratio * np.maximum(np.linalg.eigvalsh(cov), 0).sum()
    np.testing.assert_allclose(got, ev, rtol=1e-6)


def test_pca_basis_orthonormal_and_variance_ordered(spark):
    x = _planted()
    _, comps, ratio = sim.pca_fit(_df(spark, x), k=5)
    np.testing.assert_allclose(comps @ comps.T, np.eye(5), atol=1e-8)
    assert all(ratio[i] >= ratio[i + 1] - 1e-12 for i in range(4))
    assert 0 <= ratio.sum() <= 1 + 1e-9
    # rank-3 plant: 3 components capture ~everything
    assert ratio[:3].sum() > 0.999
    # deterministic sign: max-|loading| entry positive
    for row in comps:
        assert row[np.abs(row).argmax()] > 0


def test_pca_projection_reconstructs_planted_rank(spark):
    x = _planted()
    df = _df(spark, x)
    mean, comps, _ = sim.pca_fit(df, k=3)
    proj = sim.pca_project(df, mean, comps, id_cols=("vec_id",))
    out = {r.vec_id: np.array(r.proj) for r in proj.collect()}
    xc = np.asarray(x, np.float64)
    recon = np.stack([out[i] for i in range(len(x))]) @ comps + mean
    err = np.linalg.norm(recon - xc) / np.linalg.norm(xc - xc.mean(0))
    assert err < 0.01
    # projection matches driver-side algebra row-for-row
    np.testing.assert_allclose(
        out[0], (xc[0] - mean) @ comps.T, atol=1e-6
    )


def test_pca_partitioning_invariant(spark):
    x = _planted()
    m1, c1, r1 = sim.pca_fit(_df(spark, x, parts=2), k=3)
    m2, c2, r2 = sim.pca_fit(_df(spark, x, parts=13), k=3)
    np.testing.assert_allclose(m1, m2, atol=1e-9)
    np.testing.assert_allclose(r1, r2, atol=1e-9)
    np.testing.assert_allclose(c1, c2, atol=1e-6)


def test_pca_projection_plan_has_no_shuffle(spark):
    x = _planted(n=50)
    # no .repartition in the input: any Exchange in the plan would then
    # belong to the projection itself
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<float>",
    )
    mean, comps, _ = sim.pca_fit(df, k=2)
    plan = (
        sim.pca_project(df, mean, comps, id_cols=("vec_id",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
