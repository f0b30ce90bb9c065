"""Range (interval) join semantics and deterministic sampling contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_source_spark.data import table
from hadoop_source_spark.llmops import sampling as smp
from hadoop_source_spark.operators.rangejoin import range_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def intervals(spark):
    return spark.createDataFrame(
        [(1, 0, 10), (2, 5, 15), (3, 100, 100), (4, 20, 10)],
        "iv_id long, lo long, hi long",
    )


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [(10, 0), (11, 10), (12, 5), (13, 99), (14, 100), (15, 101), (16, 50)],
        "pt_id long, v long",
    )


def _pairs(df):
    return {(r.pt_id, r.iv_id) for r in df.collect()}


def test_range_join_inclusive_bounds_and_overlap(spark, points, intervals):
    got = _pairs(range_join(points, intervals, on="v", lo="lo", hi="hi", chunk=7))
    assert got == {
        (10, 1),           # v=0 at lo of [0,10]
        (11, 1), (11, 2),  # v=10 at hi of [0,10] and inside [5,15]
        (12, 1), (12, 2),  # v=5 in both
        (14, 3),           # v=100 in the degenerate [100,100]
    }
    # inverted interval (lo > hi) matches nothing; v=99/101/50 match nothing


def test_range_join_chunk_size_invariance(spark, points, intervals):
    """The chunk width is a physical knob, never a semantic one."""
    base = _pairs(range_join(points, intervals, on="v", lo="lo", hi="hi", chunk=7))
    for chunk in (1, 3, 10, 1000):
        assert (
            _pairs(range_join(points, intervals, on="v", lo="lo", hi="hi", chunk=chunk))
            == base
        ), f"chunk={chunk}"


def test_range_join_left_keeps_unmatched(spark, points, intervals):
    out = range_join(points, intervals, on="v", lo="lo", hi="hi", chunk=7, how="left")
    rows = {r.pt_id: r for r in out.filter(F.col("iv_id").isNull()).collect()}
    assert set(rows) == {13, 15, 16}


def test_range_join_equi_keys_and_no_nested_loop(spark):
    p = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 5)], "pt_id long, k string, v long"
    )
    b = spark.createDataFrame(
        [(7, "a", 0, 10)], "iv_id long, k string, lo long, hi long"
    )
    out = range_join(p, b, on="v", lo="lo", hi="hi", chunk=4, equi_keys=["k"])
    assert {(r.pt_id, r.iv_id) for r in out.collect()} == {(1, 7)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_range_join_validates_args(spark, points, intervals):
    with pytest.raises(ValueError):
        range_join(points, intervals, on="v", lo="lo", hi="hi", chunk=0)
    with pytest.raises(ValueError):
        range_join(points, intervals, on="v", lo="lo", hi="hi", chunk=5, how="full")


@pytest.fixture(scope="module")
def docs(spark):
    return table(spark, SF, "documents")


@pytest.mark.parametrize("impl", ["xxhash", "arith"])
def test_hash_split_partitions_the_corpus(spark, docs, impl):
    out = smp.hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, impl=impl
    )
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n  # fractions sum to 1 -> total coverage
    assert 0.7 * n <= counts["train"] <= 0.9 * n
    # disjoint by construction: one row per doc
    assert out.select("doc_id").distinct().count() == n


def test_hash_split_deterministic_and_layout_independent(spark, docs):
    a = {(r.doc_id, r.split) for r in smp.hash_split(docs, {"train": 0.5, "test": 0.5}).collect()}
    b = {
        (r.doc_id, r.split)
        for r in smp.hash_split(
            docs.repartition(13), {"train": 0.5, "test": 0.5}
        ).collect()
    }
    assert a == b


def test_hash_split_remainder_drops_rows(spark, docs):
    out = smp.hash_split(docs, {"keep": 0.3})
    n = docs.count()
    assert 0.2 * n <= out.count() <= 0.4 * n


def test_deterministic_sample_stable_under_append(spark, docs):
    """Membership depends only on (id, seed): sampling a subset then the
    full corpus agrees on the shared ids — the incremental-pipeline
    contract df.sample cannot give."""
    part = docs.filter(F.col("doc_id") % 2 == 0)
    s_full = {r.doc_id for r in smp.deterministic_sample(docs, 0.3).collect()}
    s_part = {r.doc_id for r in smp.deterministic_sample(part, 0.3).collect()}
    assert s_part == {i for i in s_full if i % 2 == 0}


def test_sampling_validates_args(spark, docs):
    with pytest.raises(ValueError):
        smp.deterministic_sample(docs, 1.5)
    with pytest.raises(ValueError):
        smp.hash_split(docs, {"a": 0.9, "b": 0.3})
    with pytest.raises(ValueError):
        smp.hash_bucket("doc_id", impl="nope")


def test_stratified_sample_per_stratum_rates(spark, docs):
    out = smp.stratified_sample(
        docs, "lang", {"en": 0.1, "zh": 1.0}, default_fraction=0.5
    )
    n = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    k = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert k["zh"] == n["zh"]                      # kept whole
    assert k.get("en", 0) <= 0.3 * n["en"]         # aggressively downsampled
    for lang in set(n) - {"en", "zh"}:             # default rate strata
        assert 0.2 * n[lang] <= k.get(lang, 0) <= 0.8 * n[lang]
    # subset of the corpus, never invented rows
    assert out.count() == out.join(docs, ["doc_id"], "left_semi").count()


def test_stratified_sample_validates_args(spark, docs):
    with pytest.raises(ValueError):
        smp.stratified_sample(docs, "lang", {"en": 1.2})
    with pytest.raises(ValueError):
        smp.stratified_sample(docs, "lang", {}, default_fraction=-0.1)


def test_range_join_matches_naive_on_random_data(spark):
    """Seeded randomized cross-check: chunked range join == naive
    crossJoin+BETWEEN filter on 300 points x 80 intervals (overlaps,
    degenerate and inverted intervals, negative values included)."""
    import numpy as np

    rng = np.random.RandomState(1234)
    pts = [(int(i), int(v)) for i, v in enumerate(rng.randint(-50, 250, 300))]
    ivs = []
    for i in range(80):
        lo = int(rng.randint(-60, 240))
        ln = int(rng.randint(-5, 40))  # negative length -> inverted
        ivs.append((int(i), lo, lo + ln))
    p = spark.createDataFrame(pts, "pt_id long, v long")
    b = spark.createDataFrame(ivs, "iv_id long, lo long, hi long")
    naive = {
        (r.pt_id, r.iv_id)
        for r in p.crossJoin(b)
        .filter(F.col("v").between(F.col("lo"), F.col("hi")))
        .collect()
    }
    for chunk in (1, 13, 1000):
        got = _pairs(range_join(p, b, on="v", lo="lo", hi="hi", chunk=chunk))
        assert got == naive, f"chunk={chunk}"
    assert len(naive) > 100  # the fixture actually exercises overlaps


def test_sampling_queries_have_no_shuffle(spark, docs):
    """The sampling operators must stay pure per-row projections — any
    Exchange in the plan is a regression."""
    for df in (
        smp.hash_split(docs, {"a": 0.5, "b": 0.5}),
        smp.deterministic_sample(docs, 0.3),
        smp.stratified_sample(docs, "lang", {"en": 0.2}, default_fraction=0.5),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_mixture_sample_multiplicities(spark, docs):
    """mixture_sample: floor(w) guaranteed copies per row + hash-fraction
    extra; weights ≤ 1 degenerate to stratified_sample membership; copy
    indices are 1..n; zero shuffle."""
    w = {"zh": 2.5, "en": 0.3}
    out = smp.mixture_sample(
        docs, w, strata_col="lang", id_col="doc_id",
        seed=42, impl="arith", default_weight=1.0,
    )
    rows = out.select("doc_id", "lang", "copy").collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault((r.doc_id, r.lang), []).append(r.copy)
    n_docs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    for (doc, lang), copies in per_doc.items():
        assert sorted(copies) == list(range(1, len(copies) + 1))
        lo = int(w.get(lang, 1.0))
        assert lo <= len(copies) <= lo + 1
    # every zh doc appears (weight 2.5 >= 1); en appears ~30%
    zh_docs = [d for d, lang in n_docs.items() if lang == "zh"]
    assert zh_docs and all((d, "zh") in per_doc for d in zh_docs)
    en_docs = [d for d, lang in n_docs.items() if lang == "en"]
    en_kept = sum(1 for d in en_docs if (d, "en") in per_doc)
    assert 0 < en_kept < len(en_docs)
    # default_weight=1.0 strata appear exactly once per doc
    fr = [(d, lang) for d, lang in n_docs.items() if lang not in w]
    assert all(len(per_doc[key]) == 1 for key in fr if key in per_doc)
    # expected multiplicity over the zh stratum is ~2.5
    zh_total = sum(len(per_doc[(d, "zh")]) for d in zh_docs)
    assert 2 * len(zh_docs) <= zh_total <= 3 * len(zh_docs)
    # narrow rowwise expansion: no Exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_weighted_sample_proportional_and_deterministic(spark):
    """weighted_sample (A-ES): exactly k rows, deterministic per seed,
    different across seeds, plan is TakeOrderedAndProject (no full
    sort/shuffle of the corpus), and inclusion is genuinely
    weight-proportional: on a planted corpus where 10% of rows carry
    100x weight, the heavy rows dominate the sample."""
    from pyspark.sql import functions as F

    from hadoop_source_spark.data import table
    from hadoop_source_spark.llmops import sampling as smp

    d = table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "n_chars"
    )
    s1 = smp.weighted_sample(d, "n_chars", 100, "doc_id", seed=1)
    rows1 = {r.doc_id for r in s1.collect()}
    assert len(rows1) == 100
    assert rows1 == {r.doc_id for r in smp.weighted_sample(
        d, "n_chars", 100, "doc_id", seed=1).collect()}
    s2 = {r.doc_id for r in smp.weighted_sample(
        d, "n_chars", 100, "doc_id", seed=2).collect()}
    assert rows1 != s2
    plan = smp.weighted_sample(d, "n_chars", 100, "doc_id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    planted = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") >= 900, F.lit(100)).otherwise(F.lit(1)).alias("w"),
    )
    heavy_counts = []
    for seed in range(5):
        samp = smp.weighted_sample(planted, "w", 100, "doc_id", seed=seed)
        heavy_counts.append(samp.filter(F.col("w") == 100).count())
    # heavy rows are 10% of the corpus but carry ~92% of the weight mass:
    # they must dominate every draw
    assert min(heavy_counts) > 60, heavy_counts
