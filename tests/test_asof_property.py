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
