"""RM delegation-token renewal planning: when each token renews next
and what happens to it when its applications finish.

Reference semantics (`hadoop-yarn-server-resourcemanager/.../security/
DelegationTokenRenewer.java`):

- ``setTimerForTokenRenewal:629-645``: an already-expired token
  (expiresIn <= 0) is never scheduled; otherwise the renewal fires at
  ``expirationDate - expiresIn/10`` — Java long division, a tenth of
  the remaining lifetime before expiry.
- ``DelegationTokenToRenew:304``: the effective cancel-at-end flag is
  the app's request OR'd with the
  yarn.resourcemanager.delegation-token.always-cancel conf.
- App finish (``handleAppFinishEvent:815-827``): with token keep-alive
  enabled (the MR-style lingering-client case) removal is DELAYED to
  ``now + tokenRemovalDelayMs``; otherwise
  ``removeApplicationFromRenewal:847-878`` drops the app from the
  token's referring set — a token still referenced by other live apps
  is RETAINED; the last reference cancels the timer and cancels the
  token only under the effective cancel flag (else it is dropped from
  tracking and left to expire on its own).

Spark-first: one codegen projection — no joins, no shuffles; a fleet
of RMs' token registries evaluates map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCHEDULE_RENEWAL = "SCHEDULE_RENEWAL"
WONT_RENEW_EXPIRED = "WONT_RENEW_EXPIRED"
DELAYED_REMOVAL = "DELAYED_REMOVAL"
TOKEN_RETAINED = "TOKEN_RETAINED"
CANCEL_TOKEN = "CANCEL_TOKEN"
REMOVE_WITHOUT_CANCEL = "REMOVE_WITHOUT_CANCEL"


def plan_token_renewals(
    tokens: DataFrame,
    *,
    now_ms: int,
    keep_alive_enabled: bool,
    always_cancel: bool,
    removal_delay_ms: int,
) -> DataFrame:
    """Evaluate one pass over a token registry.

    ``tokens``: (token_id, expiration long ms, should_cancel boolean
    — the submitting app's cancel-at-end request, refs int — live
    referring apps, completed int — apps finishing in this pass).

    Returns token_id + action, renew_at (scheduled renewals only),
    removal_at (delayed removals only), cancel_at_end (the effective
    OR'd flag)."""
    cancel_eff = F.col("should_cancel") | F.lit(always_cancel)
    expires_in = F.col("expiration") - now_ms
    renew_at = F.col("expiration") - F.floor(expires_in / 10).cast("long")
    finishing = F.col("completed") > 0
    last_ref = F.col("refs") - F.col("completed") <= 0
    if keep_alive_enabled:
        removal = F.when(
            finishing, F.lit(DELAYED_REMOVAL)
        )
    else:
        removal = F.when(
            finishing & ~last_ref, F.lit(TOKEN_RETAINED)
        ).when(
            finishing & cancel_eff, F.lit(CANCEL_TOKEN)
        ).when(finishing, F.lit(REMOVE_WITHOUT_CANCEL))
    action = removal.when(expires_in <= 0, F.lit(WONT_RENEW_EXPIRED)).otherwise(
        F.lit(SCHEDULE_RENEWAL)
    )
    return tokens.select(
        "token_id",
        action.alias("action"),
        F.when(action == SCHEDULE_RENEWAL, renew_at)
        .cast("long")
        .alias("renew_at"),
        F.when(
            action == DELAYED_REMOVAL, F.lit(now_ms + removal_delay_ms)
        )
        .cast("long")
        .alias("removal_at"),
        cancel_eff.alias("cancel_at_end"),
    )
