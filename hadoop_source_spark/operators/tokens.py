"""Delegation-token lifecycle: issue → renew chain → expiry sweep.

Reference semantics (`common/security/token/delegation/
AbstractDelegationTokenSecretManager.java`):
- a token is issued with issueDate and a hard maxDate = issueDate +
  maxLifetime (:437 createIdentifier path);
- renewToken (:568) extends expiry to min(now + renewInterval,
  maxDate) — but only a token that is STILL VALID can be renewed (an
  expired token throws InvalidToken, so a late renewal does NOT
  resurrect it);
- cancelToken (:620) removes the token outright;
- the background expiry sweep (removeExpiredToken, :674) classifies
  everything whose expiry passed "now".

Spark-first: the renewal chain is a per-token sequential fold, but the
chain is BOUNDED (renewals per token, not corpus-sized), so it runs as
one groupBy(collect_list) + a JVM higher-order `aggregate` fold over
the sorted renewal array — codegen, no Python, one shuffle keyed by
token. All time arithmetic is integer epoch seconds so the fold is
exact and engine-portable (DuckDB replays it with list_reduce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_states(
    tokens: DataFrame,
    renewals: DataFrame,
    now: DataFrame,
    renew_interval_s: int = 7 * 86400,
    max_lifetime_s: int = 30 * 86400,
) -> DataFrame:
    """Resolve every token's expiry and status at the probe instant.

    tokens: token_id, owner, issue_ts (timestamp), cancelled (bool).
    renewals: token_id, renew_ts (timestamp) — multiple rows per token.
    now: ONE-ROW frame with now_s (bigint epoch seconds), crossJoined
    (never collected).

    Output: token_id, owner, n_renewals, expiry_s, status
    (CANCELLED / EXPIRED / VALID). Renewal semantics: fold the sorted
    renewal times; a renewal before the issue instant is invalid (the
    token did not exist — dropped up front, n_renewals counts only
    in-lifetime attempts), and an attempt applies only while renew_ts
    <= current expiry (InvalidToken guard), setting expiry =
    min(renew_ts + renewInterval, maxDate)."""
    iss = tokens.select(
        "token_id", F.unix_timestamp("issue_ts").alias("__iss")
    )
    r = (
        renewals.join(iss, "token_id")
        .filter(F.unix_timestamp("renew_ts") >= F.col("__iss"))
        .groupBy("token_id")
        .agg(
            F.sort_array(
                F.collect_list(F.unix_timestamp("renew_ts"))
            ).alias("__renews")
        )
    )
    issue_s = F.unix_timestamp("issue_ts")
    joined = (
        tokens.join(r, "token_id", "left")
        .withColumn(
            "__renews",
            F.coalesce(
                "__renews", F.expr("cast(array() as array<bigint>)")
            ),
        )
        .withColumn("__max_s", issue_s + F.lit(max_lifetime_s))
        .withColumn(
            "__init_s",
            F.least(issue_s + F.lit(renew_interval_s), F.col("__max_s")),
        )
    )
    expiry = F.aggregate(
        F.col("__renews"),
        F.col("__init_s").cast("bigint"),
        lambda acc, ts: F.when(
            ts <= acc,
            F.least(ts + F.lit(renew_interval_s), F.col("__max_s")),
        ).otherwise(acc),
    )
    out = joined.withColumn("expiry_s", expiry).crossJoin(
        F.broadcast(now)
    )
    return out.select(
        "token_id",
        "owner",
        F.size("__renews").cast("long").alias("n_renewals"),
        "expiry_s",
        F.when(F.col("cancelled"), F.lit("CANCELLED"))
        .when(F.col("expiry_s") < F.col("now_s"), F.lit("EXPIRED"))
        .otherwise(F.lit("VALID"))
        .alias("status"),
    )
