"""Property-based validation of the asof kernel against a Python model
(the reference's seeded-random round-trip style, RandomDatum.java, with
hypothesis driving the case generation)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from hadoop_source_spark.operators import asof

KEYS = ["g0", "g1", "g2"]


def model_asof(left, right, direction):
    out = {}
    for g, t in left:
        cands = [
            (rt, payload)
            for (rg, rt, payload) in right
            if rg == g and (rt <= t if direction == "backward" else rt >= t)
        ]
        if not cands:
            out[(g, t)] = (None, None)
        elif direction == "backward":
            out[(g, t)] = max(cands)
        else:
            out[(g, t)] = min(cands)
    return out


@settings(max_examples=8, deadline=None)
@given(
    left=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(0, 50)),
        min_size=1, max_size=25, unique=True,
    ),
    right=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(0, 50)),
        min_size=0, max_size=25, unique=True,
    ),
    direction=st.sampled_from(["backward", "forward"]),
)
def test_asof_matches_model(spark, left, right, direction):
    right_payload = [(g, t, f"p{g}{t}") for (g, t) in right]
    ldf = spark.createDataFrame(left, "g string, t long")
    rdf = spark.createDataFrame(
        right_payload or [("_", -999, "_")], "g string, t long, payload string"
    )
    got = {
        (r.g, r.t): (r.t_right, r.payload)
        for r in asof.asof_join(
            ldf, rdf, on="t", by="g", direction=direction, how="left"
        ).collect()
    }
    want = model_asof(left, right_payload or [("_", -999, "_")], direction)
    assert got == want


def test_asof_matches_pandas_merge_asof(spark):
    """asof_join == pandas.merge_asof on a randomized keyed corpus, for
    every direction x tolerance x how combination — pandas is the
    de-facto reference semantics for as-of joins (ties to nearest go
    backward, tolerance is inclusive, unmatched rows null/drop)."""
    import numpy as np
    import pandas as pd

    from hadoop_source_spark.operators.asof import asof_join

    rng = np.random.default_rng(11)
    n_l, n_r = 400, 300
    lpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_l),
            "t": rng.integers(0, 1000, n_l).astype("int64"),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_r),
            "t": rng.choice(1000, n_r, replace=False).astype("int64"),
            "rid": np.arange(n_r, dtype="int64") + 10_000,
        }
    )
    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf)

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 25):
            want = pd.merge_asof(
                lpdf.sort_values("t"),
                rpdf.sort_values("t"),
                on="t",
                by="k",
                direction=direction,
                tolerance=tol,
                suffixes=("", "_right"),
            ).sort_values("lid")
            got = (
                asof_join(
                    ldf, rdf, on="t", by="k", direction=direction,
                    how="left", tolerance=tol,
                )
                .orderBy("lid")
                .toPandas()
            )
            g = got["rid"].astype("float64").fillna(-1).to_numpy()
            w = want["rid"].astype("float64").fillna(-1).to_numpy()
            assert (g == w).all(), (direction, tol, int((g != w).sum()))
            # matched ordering value comes back as t_right
            gm = got["t_right"].astype("float64").fillna(-1).to_numpy()
            # pandas keeps the left `t`; recompute the matched right t
            rt = rpdf.set_index("rid")["t"]
            wm = want["rid"].map(rt).astype("float64").fillna(-1).to_numpy()
            assert (gm == wm).all(), (direction, tol)
            # inner == left minus the unmatched rows
            n_inner = asof_join(
                ldf, rdf, on="t", by="k", direction=direction,
                how="inner", tolerance=tol,
            ).count()
            assert n_inner == int((w >= 0).sum()), (direction, tol)
