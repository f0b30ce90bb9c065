"""Temperature-resampling pins (mT5 / XLM-R recipe)."""

from __future__ import annotations

import math

import pytest

from hadoop_source_spark.llmops import sampling as smp


def _df(spark, counts):
    rows = []
    i = 0
    for lang, n in counts.items():
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_alpha_one_is_natural_proportions(spark):
    # alpha=1: w_l = target/N for every stratum — a flat rate
    df = _df(spark, {"en": 40, "fr": 10})
    out = smp.temperature_mixture(df, alpha=1.0, target_rows=25)
    ws = {r["lang"]: r["sample_weight"] for r in out.collect()}
    assert ws == {"en": 0.5, "fr": 0.5}


def test_alpha_half_lifts_low_resource(spark):
    df = _df(spark, {"en": 160, "fr": 10})
    out = smp.temperature_mixture(df, alpha=0.5, target_rows=100)
    ws = {r["lang"]: r["sample_weight"] for r in out.collect()}
    # p_en ∝ sqrt(160), p_fr ∝ sqrt(10); w = p * 100 / n
    s = math.sqrt(160) + math.sqrt(10)
    assert ws["en"] == round(math.sqrt(160) / s * 100 / 160, 6)
    assert ws["fr"] == round(math.sqrt(10) / s * 100 / 10, 6)
    assert ws["fr"] > 1 > ws["en"]  # low-resource upsampled past 1 epoch
    # integer-part copies: every fr doc appears at least floor(w) times
    fr_copies = (
        out.filter("lang = 'fr'").groupBy("doc_id").count().collect()
    )
    assert all(r["count"] >= int(ws["fr"]) for r in fr_copies)


def test_expected_output_size_hits_budget(spark):
    df = _df(spark, {"en": 200, "zh": 50, "fr": 20})
    n = smp.temperature_mixture(df, alpha=0.5, target_rows=150).count()
    # hash-fraction noise is per-stratum bounded; budget within 10%
    assert abs(n - 150) <= 15


def test_alpha_validation(spark):
    df = _df(spark, {"en": 5})
    with pytest.raises(ValueError):
        smp.temperature_mixture(df, alpha=0.0, target_rows=5)
    with pytest.raises(ValueError):
        smp.temperature_mixture(df, alpha=1.5, target_rows=5)
