"""Decaying RPC scheduler + fair call queue — caller priority from
decayed call history.

Reference semantics (`common/ipc/DecayRpcScheduler.java`):
- per-caller call counts decay by `decayFactor` (default 0.5) at every
  sweep boundary (`decayCurrentCounts`, :458 — counts AND the total
  decay together, so shares are computed over the same horizon);
- a caller's priority is the FIRST threshold its share of the total
  decayed count stays under (`computePriorityLevel`, :530: with 4
  levels the defaults are 0.125 / 0.25 / 0.5 — under 12.5 % of traffic
  keeps top priority 0, over 50 % drops to the lowest queue 3);
- cost defaults to 1/call (`DefaultCostProvider`) but can weight by
  processing time (`WeightedTimeCostProvider`) — exposed as the `cost`
  column;
- backoff-by-response-time (`shouldBackOff`, :388 over
  `decayedAvgResponseTime`): a priority level whose decayed average
  response time exceeds its threshold pushes clients off
  (`FairCallQueue` RetriableException path).

Spark-first: the sweep loop has a closed form — a call in sweep-period
`p` has been decayed `(P - p)` times by probe period `P`, so its
surviving weight is `factor^(P - p)`. The whole scheduler state is ONE
partial-agg shuffle over the call log keyed by caller (bounded by the
caller population), followed by caller-count-sized arithmetic; the
response-time rollup reuses the same pass (per-caller decayed resp sums
aggregate to priority levels without touching the log again).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# share-of-total thresholds for 4 priority levels (DecayRpcScheduler
# DEFAULT: IPC_SCHEDULER_PRIORITY_LEVELS_DEFAULT=4 → 0.125/0.25/0.5)
DEFAULT_THRESHOLDS = (0.125, 0.25, 0.5)


def decayed_caller_state(
    calls: DataFrame,
    period: str = "1 day",
    factor: float = 0.5,
) -> DataFrame:
    """Per-caller decayed scheduler state at the log's probe time
    (max call ts — "now" for the last sweep).

    Input columns: caller (string), ts (timestamp), cost (double —
    1.0 for DefaultCostProvider), resp_ms (double, per-call response
    time for the backoff rollup). Output: caller, decayed_cost,
    decayed_resp_sum, decayed_resp_weight.

    Sweep boundaries are UTC period boundaries (day periods here), so
    the decay exponent is an exact integer both engines agree on:
    weight = factor^(days(probe) - days(ts)).
    """
    if period != "1 day":  # day-granularity keeps the exponent integral
        raise ValueError("only '1 day' sweep periods are supported")
    probe = calls.agg(
        F.max(F.to_date("ts")).alias("__probe_day")
    )
    w = F.pow(
        F.lit(factor),
        F.datediff(F.col("__probe_day"), F.to_date("ts")).cast("double"),
    )
    return (
        calls.crossJoin(F.broadcast(probe))
        .select(
            "caller",
            (F.col("cost") * w).alias("__wc"),
            (F.col("resp_ms") * w).alias("__wr"),
            w.alias("__w"),
        )
        .groupBy("caller")
        .agg(
            F.sum("__wc").alias("decayed_cost"),
            F.sum("__wr").alias("decayed_resp_sum"),
            F.sum("__w").alias("decayed_resp_weight"),
        )
    )


def assign_priorities(
    state: DataFrame, thresholds: tuple[float, ...] = DEFAULT_THRESHOLDS
) -> DataFrame:
    """computePriorityLevel: share = caller's decayed cost over the
    total; priority = index of the first threshold the share is under,
    len(thresholds) if none. The grand total is a scalar partial agg
    broadcast back over the caller-sized frame — no single-partition
    window anywhere in the plan."""
    # Lineage cut (r14, §5): `state` is caller-count-sized by contract
    # but its lineage is a corpus-sized aggregation — consumed here by
    # BOTH the grand-total scalar and the share projection (and every
    # downstream consumer of the priority table re-inlines it again:
    # the rpc_scheduler_priority plan paid 8 source scans). One lazy
    # checkpoint makes the log aggregation evaluate exactly once.
    state = state.localCheckpoint(eager=False)
    total = state.agg(F.sum("decayed_cost").alias("__total"))
    state = state.crossJoin(F.broadcast(total))
    share = F.col("decayed_cost") / F.col("__total")
    pri = F.lit(len(thresholds))
    for i in range(len(thresholds) - 1, -1, -1):
        pri = F.when(share < F.lit(thresholds[i]), F.lit(i)).otherwise(pri)
    return state.select(
        "caller",
        "decayed_cost",
        "decayed_resp_sum",
        "decayed_resp_weight",
        share.alias("share"),
        pri.alias("priority"),
    )


def backoff_by_response_time(
    prioritized: DataFrame, resp_thresholds_ms: tuple[float, ...]
) -> DataFrame:
    """Per-priority-level decayed average response time + the
    shouldBackOff verdict: level i backs clients off when its decayed
    avg response exceeds resp_thresholds_ms[i] (reference default is
    10s * (i+1); pass thresholds scaled to the workload's resp unit).
    Input must carry priority + decayed resp sums from
    assign_priorities; output is priority-level-sized."""
    per_level = prioritized.groupBy("priority").agg(
        (F.sum("decayed_resp_sum") / F.sum("decayed_resp_weight")).alias(
            "prio_avg_resp"
        ),
        F.count(F.lit(1)).alias("n_callers"),
    )
    thr = F.array(*[F.lit(float(t)) for t in resp_thresholds_ms])
    return per_level.select(
        "priority",
        "n_callers",
        "prio_avg_resp",
        (
            F.col("prio_avg_resp")
            > F.get(thr, F.col("priority").cast("int"))
        ).alias("backoff"),
    )


def retry_schedule(
    calls: DataFrame,
    policies: DataFrame,
) -> DataFrame:
    """Retry-policy schedule matrix (reference `common/io/retry/
    RetryPolicies.java`): for every (failed call, policy), the action
    at each attempt and the cumulative wait. Policies modeled exactly:

      TRY_ONCE_THEN_FAIL (:65)     — fail at the first retry decision
      RETRY_FOREVER (:72)          — always retry, no sleep
      FIXED_SLEEP (:91)            — sleep t while retries < max
      PROPORTIONAL_SLEEP (:112)    — sleep t*(retries+1) (:333)
      EXPONENTIAL_BACKOFF (:124)   — sleep min(t * 2^(retries+1), cap)
        (:726); the reference multiplies by a random in [0.5, 1.5) —
        here the deterministic expectation (x1.0), the same
        substitution operators/readpath makes for the tie shuffle.

    calls: call_id, n_failures (how many times it has failed).
    policies: policy, max_retries, sleep_ms. Output one row per
    (call, policy, attempt 0..n_failures-1): action RETRY/FAIL,
    sleep_ms, cum_sleep_ms before giving up or succeeding. Attempts
    fan out via sequence() — a pure projection, no shuffle until the
    (bounded) per-call window for the cumulative sum."""
    fan = calls.crossJoin(F.broadcast(policies)).select(
        "call_id", "policy", "max_retries", "sleep_ms",
        F.explode(
            F.sequence(F.lit(0), F.col("n_failures") - 1)
        ).alias("attempt"),
    )
    a = F.col("attempt")
    sleep = (
        F.when(F.col("policy") == "RETRY_FOREVER", F.lit(0.0))
        .when(F.col("policy") == "FIXED_SLEEP", F.col("sleep_ms"))
        .when(
            F.col("policy") == "PROPORTIONAL_SLEEP",
            F.col("sleep_ms") * (a + 1),
        )
        .when(
            F.col("policy") == "EXPONENTIAL_BACKOFF",
            F.least(
                F.col("sleep_ms") * F.pow(F.lit(2.0), a + 1),
                F.lit(9.0e15),
            ),
        )
        .otherwise(F.lit(0.0))
    )
    fails = F.when(
        F.col("policy") == "TRY_ONCE_THEN_FAIL", F.lit(True)
    ).otherwise(
        (F.col("policy") != "RETRY_FOREVER") & (a >= F.col("max_retries"))
    )
    w = (
        Window.partitionBy("call_id", "policy")
        .orderBy("attempt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    stepped = fan.select(
        "call_id", "policy", "attempt",
        F.when(fails, F.lit("FAIL")).otherwise(F.lit("RETRY")).alias(
            "action"
        ),
        F.when(fails, F.lit(0.0)).otherwise(sleep).alias("sleep_ms"),
    )
    return stepped.withColumn(
        "cum_sleep_ms", F.round(F.sum("sleep_ms").over(w), 4)
    ).withColumn("sleep_ms", F.round("sleep_ms", 4))


def wrr_drain_order(
    calls: DataFrame,
    num_queues: int,
    weights: list[int] | None = None,
    queue_col: str = "queue",
    order_col: str = "arrival_seq",
) -> DataFrame:
    """FairCallQueue drain schedule under the weighted-round-robin
    multiplexer (reference `ipc/WeightedRoundRobinMultiplexer.java:41`
    — weights [9,4,1] mean a 14-read cycle serving queue 0 nine
    times, queue 1 four, queue 2 once, repeat; default weights are
    2^N, doubling toward the highest-priority queue, :95-104; a
    weights list that does not match the queue count is a
    configuration error, :76-80).

    In the saturated regime (every queue backlogged — exactly when
    the multiplexer's fairness matters; an empty queue makes the
    reader scan ahead, a race the reference explicitly tolerates,
    :39-40) the schedule has a CLOSED FORM: with cycle length
    L = Σw and prefix_i = Σ_{j<i} w_j, the p-th call of queue i
    (FIFO) is served at global slot
    (p div w_i)·L + prefix_i + (p mod w_i).

    calls: (…, queue int 0-based, arrival_seq — FIFO order within the
    queue). Output adds fifo_pos, cycle, and serve_slot (the global
    drain position). One per-queue window + pure arithmetic — no
    scheduler loop, no shuffle beyond the window's."""
    if weights is None:
        # getDefaultQueueWeights: 2^N, lowest queue weight 1
        weights = [1 << (num_queues - 1 - i) for i in range(num_queues)]
    if len(weights) != num_queues:
        raise ValueError(
            f"must specify exactly {num_queues} weights: one for each "
            "priority level"
        )
    total = sum(weights)
    prefix = [sum(weights[:i]) for i in range(num_queues)]
    w_expr = F.lit(None).cast("long")
    p_expr = F.lit(None).cast("long")
    for i in range(num_queues - 1, -1, -1):
        w_expr = F.when(F.col(queue_col) == i, F.lit(weights[i])).otherwise(
            w_expr
        )
        p_expr = F.when(F.col(queue_col) == i, F.lit(prefix[i])).otherwise(
            p_expr
        )
    win = Window.partitionBy(queue_col).orderBy(order_col)
    pos = F.row_number().over(win) - 1
    out = calls.select(
        *calls.columns,
        pos.alias("fifo_pos"),
        w_expr.alias("__w"),
        p_expr.alias("__p"),
    )
    return out.select(
        *calls.columns,
        "fifo_pos",
        F.floor(F.col("fifo_pos") / F.col("__w")).alias("cycle"),
        (
            F.floor(F.col("fifo_pos") / F.col("__w")) * total
            + F.col("__p")
            + F.pmod(F.col("fifo_pos"), F.col("__w"))
        ).cast("long").alias("serve_slot"),
    )


def retry_cache_replay(
    calls: DataFrame,
    expiry: int,
    client_col: str = "client_id",
    call_col: str = "call_id",
    ts_col: str = "ts",
    success_col: str = "succeeded",
) -> DataFrame:
    """RPC at-most-once retry cache (reference `ipc/RetryCache.java:46`
    — non-idempotent NameNode ops are cached by the unique
    (clientId, callId) of the request so a RETRY of an already-applied
    op returns the cached outcome instead of re-executing):

    - first arrival of a key EXECUTES and adds an entry whose
      expiration anchors at add time (:72 — re-executions do NOT
      extend it);
    - a retry that finds an un-expired entry is a CACHE HIT
      (`waitForCompletion` — metrics incrCacheHit); but when the
      cached attempt FAILED, the retry flips the entry back to
      INPROGRESS and re-executes (:waitForCompletion tail: "previous
      request has failed, the expectation is that it will be retried
      again");
    - expired entries are evicted on access (LightWeightCache), so an
      arrival past the epoch's expiration executes as a NEW entry —
      checked BEFORE the failed-retry rule, exactly the lookup order.

    calls: (client_id, call_id, ts, succeeded — the outcome IF the
    attempt executes). Output per attempt adds action (NEW /
    CACHE_HIT / RETRY_EXECUTE / NEW_AFTER_EXPIRY), executed (bool),
    epoch_start (the live entry's add time). The fold runs per
    (client, call) key via applyInPandas — groups are retry-chain
    sized (a handful of rows), so state is bounded and the single
    shuffle keys on the cache key itself."""
    import pandas as pd

    out_schema = (
        f"{client_col} string, {call_col} long, {ts_col} long, "
        f"{success_col} boolean, action string, executed boolean, "
        "epoch_start long"
    )

    # One kernel group per CLIENT, not per cache key (r14): the fold
    # is still per (client, call) — the loop resets its state at every
    # call-id boundary of the (call, ts)-sorted frame — but the
    # call-id fan-in cuts applyInPandas group invocations by the
    # per-client call count (2000 -> 50 at the workload shape, whose
    # per-group overhead was the whole query cost). State stays
    # retry-chain bounded; the shuffle still keys on the cache-key
    # family.
    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([call_col, ts_col], kind="mergesort")
        actions, executed_l, epochs = [], [], []
        cur_call = object()
        epoch_start = None
        last_success = None
        for call, ts, ok in zip(
            pdf[call_col], pdf[ts_col], pdf[success_col]
        ):
            if call != cur_call:
                cur_call = call
                epoch_start = None
                last_success = None
            if epoch_start is None:
                action, executed = "NEW", True
                epoch_start = ts
            elif ts > epoch_start + expiry:
                action, executed = "NEW_AFTER_EXPIRY", True
                epoch_start = ts
            elif not last_success:
                action, executed = "RETRY_EXECUTE", True
            else:
                action, executed = "CACHE_HIT", False
            if executed:
                last_success = bool(ok)
            actions.append(action)
            executed_l.append(executed)
            epochs.append(epoch_start)
        return pd.DataFrame(
            {
                client_col: pdf[client_col],
                call_col: pdf[call_col],
                ts_col: pdf[ts_col],
                success_col: pdf[success_col],
                "action": actions,
                "executed": executed_l,
                "epoch_start": epochs,
            }
        )

    return (
        calls.select(client_col, call_col, ts_col, success_col)
        .groupBy(client_col)
        .applyInPandas(fold, out_schema)
    )
