"""Delegation-token fold and rolling-anomaly kernel pins vs
hand-computed expectations (AbstractDelegationTokenSecretManager renew
semantics; trailing-window 3-sigma rule)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hadoop_source_spark.operators import timeseries as tsr
from hadoop_source_spark.operators import tokens as tk

DAY = 86400
EPOCH = dt.datetime(2024, 1, 1)


def _d(days):
    return EPOCH + dt.timedelta(days=days)


def _run_tokens(spark, token_rows, renew_rows, now_days=100):
    tokens = spark.createDataFrame(
        token_rows, "token_id long, owner string, issue_ts timestamp, "
        "cancelled boolean"
    )
    renews = spark.createDataFrame(
        renew_rows, "token_id long, renew_ts timestamp"
    )
    now = spark.createDataFrame(
        [(int(_d(now_days).replace(tzinfo=dt.timezone.utc).timestamp()),)],
        "now_s long",
    )
    return {
        r.token_id: r
        for r in tk.token_states(
            tokens, renews, now, renew_interval_s=7 * DAY,
            max_lifetime_s=30 * DAY,
        ).collect()
    }


def test_token_renew_chain_and_guards(spark):
    toks = [
        (1, "a", _d(0), False),   # never renewed → expires day 7
        (2, "a", _d(0), False),   # renewed day 5 → expires day 12
        (3, "a", _d(0), False),   # renewal day 9 AFTER day-7 expiry: ignored
        (4, "a", _d(0), False),   # chain 5→12, 11→18, 16→23, 23→min(30,30): maxDate clamp
        (5, "a", _d(10), False),  # pre-issue renewal dropped entirely
        (6, "a", _d(0), True),    # cancelled wins over everything
    ]
    renews = [
        (2, _d(5)),
        (3, _d(9)),
        (4, _d(5)), (4, _d(11)), (4, _d(16)), (4, _d(23)),
        (5, _d(3)),
        (6, _d(5)),
    ]
    out = _run_tokens(spark, toks, renews)
    base = int(EPOCH.replace(tzinfo=dt.timezone.utc).timestamp())
    assert out[1].expiry_s == base + 7 * DAY and out[1].n_renewals == 0
    assert out[2].expiry_s == base + 12 * DAY and out[2].n_renewals == 1
    assert out[3].expiry_s == base + 7 * DAY   # late renewal can't resurrect
    assert out[4].expiry_s == base + 30 * DAY  # maxDate clamp
    assert out[5].n_renewals == 0              # pre-issue renewal invalid
    assert out[5].expiry_s == base + 17 * DAY  # issue day10 + 7
    assert out[6].status == "CANCELLED"
    # sweep classification at day 100: everything non-cancelled expired
    assert out[1].status == "EXPIRED"
    near = _run_tokens(spark, [(9, "a", _d(95), False)], [], now_days=100)
    assert near[9].status == "VALID"           # expiry day 102 > now 100


def _buckets(spark, vals, series="s"):
    return spark.createDataFrame(
        [(series, i, float(v)) for i, v in enumerate(vals)],
        "series string, idx int, val double",
    )


def test_rolling_zscore_flags_spike_not_itself(spark):
    # steady 10s with noise, then a spike at the end. the spike's own
    # window excludes it, so its z is huge; the steady rows stay calm.
    vals = [10, 11, 9, 10, 11, 9, 10, 11, 100]
    out = {
        r.idx: r
        for r in tsr.rolling_zscore(
            _buckets(spark, vals), lookback=7, min_obs=3
        ).collect()
    }
    assert out[8].is_anomaly and out[8].z > 3
    assert all(not out[i].is_anomaly for i in range(3, 8))
    # warm-up rows (fewer than min_obs trailing buckets) are unscored
    assert out[0].z is None and out[1].z is None and out[2].z is None
    assert out[0].is_anomaly is None
    # trailing window stats exclude the current row
    assert out[8].win_mean == pytest.approx(sum(vals[1:8]) / 7)


def test_rolling_zscore_zero_variance_guard(spark):
    out = {
        r.idx: r
        for r in tsr.rolling_zscore(
            _buckets(spark, [5, 5, 5, 5, 9]), lookback=7, min_obs=3
        ).collect()
    }
    assert out[4].z is None  # std 0 → unscored, no division blowup


def test_ewma_matches_hand_weights(spark):
    vals = [1.0, 2.0, 4.0]
    df = _buckets(spark, vals).withColumn(
        "e", tsr.ewma(alpha=0.5, span=10)
    )
    out = {r.idx: r.e for r in df.collect()}
    assert out[0] == pytest.approx(1.0)
    assert out[1] == pytest.approx((2 + 0.5 * 1) / 1.5)
    assert out[2] == pytest.approx((4 + 0.5 * 2 + 0.25 * 1) / 1.75)


def test_ewma_window_truncates_at_span(spark):
    # span=2: only the previous bucket contributes
    df = _buckets(spark, [1.0, 1.0, 100.0, 0.0, 0.0]).withColumn(
        "e", tsr.ewma(alpha=0.5, span=2)
    )
    out = {r.idx: r.e for r in df.collect()}
    assert out[4] == pytest.approx(0.0)  # the 100 spike aged out entirely

def test_cusum_catches_small_sustained_drift(spark):
    # warmup: mean 10, sd 1. then a +1.5 sustained shift — under 2 sigma
    # per bucket (z-score silent) but CUSUM accumulates and alarms, then
    # restarts.
    vals = [9.0, 10.0, 11.0, 10.0, 9.0, 10.0, 11.0] + [11.5] * 10
    out = sorted(
        tsr.cusum_detect(
            _buckets(spark, [float(v) for v in vals]),
            warmup=7, k_scale=0.5, h_scale=2.0,
        ).collect(),
        key=lambda r: r.idx,
    )
    assert all(r.alarm is None for r in out[:7])       # warmup unscored
    alarms = [r.idx for r in out if r.alarm]
    assert alarms, "sustained small drift must alarm"
    first = alarms[0]
    # drift of (11.5-10-0.5*sd)/step accumulates ~1.08/step vs h=2*sd≈1.67:
    # alarm within a few steps, NOT on the first shifted bucket
    assert 8 <= first <= 11
    # restart semantics: the bucket after an alarm starts a fresh ramp
    after = next(r for r in out if r.idx == first + 1)
    pre = next(r for r in out if r.idx == first)
    assert after.sp < pre.sp + 0.5  # reset, not continued accumulation
    # a flat series never alarms
    flat = tsr.cusum_detect(
        _buckets(spark, [10.0] * 20), warmup=7, k_scale=0.5, h_scale=2.0
    ).collect()
    assert not any(r.alarm for r in flat if r.alarm is not None)
