"""Delegation-token renewal pins (DelegationTokenRenewer.java
setTimerForTokenRenewal:629-645, DelegationTokenToRenew:304,
handleAppFinishEvent:815-827, removeApplicationFromRenewal:847-878)."""

from __future__ import annotations

from hadoop_source_spark.operators import tokenrenew

SCHEMA = (
    "token_id long, expiration long, should_cancel boolean,"
    " refs int, completed int"
)
NOW = 1_000_000


def _run(spark, rows, **kw):
    conf = dict(
        now_ms=NOW, keep_alive_enabled=False, always_cancel=False,
        removal_delay_ms=30_000,
    )
    conf.update(kw)
    out = tokenrenew.plan_token_renewals(
        spark.createDataFrame(rows, SCHEMA), **conf
    ).collect()
    return {r["token_id"]: r for r in out}


def test_renewal_timing_tenth_before_expiry(spark):
    got = _run(
        spark,
        [
            (1, NOW + 100_000, False, 1, 0),  # renews at exp - 10_000
            (2, NOW + 7, False, 1, 0),        # 7/10 truncates to 0
            (3, NOW - 5, False, 1, 0),        # already expired
            (4, NOW, False, 1, 0),            # expiresIn == 0 counts too
        ],
    )
    assert got[1]["action"] == "SCHEDULE_RENEWAL"
    assert got[1]["renew_at"] == NOW + 100_000 - 10_000
    assert got[2]["renew_at"] == NOW + 7  # integer division truncates
    assert got[3]["action"] == "WONT_RENEW_EXPIRED"
    assert got[4]["action"] == "WONT_RENEW_EXPIRED"


def test_last_reference_cancel_matrix(spark):
    got = _run(
        spark,
        [
            (1, NOW + 1000, True, 2, 2),   # last refs gone, cancel asked
            (2, NOW + 1000, False, 2, 2),  # last refs gone, no cancel
            (3, NOW + 1000, True, 3, 1),   # others still reference it
        ],
    )
    assert got[1]["action"] == "CANCEL_TOKEN"
    assert got[2]["action"] == "REMOVE_WITHOUT_CANCEL"
    assert got[3]["action"] == "TOKEN_RETAINED"


def test_always_cancel_overrides_request(spark):
    got = _run(
        spark, [(1, NOW + 1000, False, 1, 1)], always_cancel=True
    )
    assert got[1]["action"] == "CANCEL_TOKEN"
    assert got[1]["cancel_at_end"]


def test_keep_alive_delays_removal(spark):
    got = _run(
        spark,
        [(1, NOW + 1000, True, 1, 1), (2, NOW + 1000, True, 2, 0)],
        keep_alive_enabled=True,
    )
    assert got[1]["action"] == "DELAYED_REMOVAL"
    assert got[1]["removal_at"] == NOW + 30_000
    assert got[2]["action"] == "SCHEDULE_RENEWAL"  # nothing finishing
