"""ZKFC automatic-failover decisions: what the ZooKeeper failover
controller does on every health-state change and on a manually
requested graceful failover.

Reference semantics (`hadoop-common/.../ha/ZKFailoverController.java`
and `ActiveStandbyElector.java`):

- ``recheckElectability:801-852``: a pending election-join delay
  defers everything (schedule a recheck, :808-816); otherwise
  SERVICE_HEALTHY joins the election unless the node is an OBSERVER;
  INITIALIZING quits WITHOUT marking fencing necessary;
  SERVICE_UNHEALTHY / SERVICE_NOT_RESPONDING quit with
  ``needFence=true``; HEALTH_MONITOR_FAILED is a fatal error. The
  quit branches reset the local service state to INITIALIZING.
- ``doGracefulFailover:654-731`` check order: the local target must
  be SERVICE_HEALTHY and not an OBSERVER
  (``checkEligibleForFailover:756-771``); no current active is an
  error (:663-669); the local node already holding active is a
  successful no-op (:672-676); after asking every other node to
  cede, no active attempt within the timeout is either
  "became unhealthy while trying to failover" or "did not get an
  opportunity" (:701-714); otherwise the attempt's own outcome
  propagates (:723-729).
- The attempt itself (``ActiveStandbyElector.becomeActive:889-909``
  + ``fenceOldActive:954-985`` + ``ZKFC.doFence:536-559``): a
  breadcrumb left by a previous active that is not our own data
  must be fenced — graceful transitionToStandby first, then the
  configured fencer (unconfigured fencing is itself a failure);
  our own breadcrumb or no breadcrumb needs no fence; then the
  transitionToActive RPC decides success.

Spark-first: both tables are pure codegen when-chains over a
conf-free row — zero joins, zero shuffles, a fleet of a million
ZKFC pairs decides map-side. The fence/RPC outcome columns are
fault-injection inputs standing in for the live RPCs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEALTHY = "SERVICE_HEALTHY"

JOIN_ELECTION = "JOIN_ELECTION"
OBSERVER_NO_JOIN = "OBSERVER_NO_JOIN"
DELAYED_RECHECK = "DELAYED_RECHECK"
QUIT_NO_FENCE = "QUIT_NO_FENCE"
QUIT_NEED_FENCE = "QUIT_NEED_FENCE"
FATAL = "FATAL"

NOT_HEALTHY = "NOT_HEALTHY"
OBSERVER_TARGET = "OBSERVER_TARGET"
NO_ACTIVE = "NO_ACTIVE"
ALREADY_ACTIVE = "ALREADY_ACTIVE"
UNHEALTHY_DURING_WAIT = "UNHEALTHY_DURING_WAIT"
ELECTION_TIMEOUT = "ELECTION_TIMEOUT"
FENCE_CONFIG_ERROR = "FENCE_CONFIG_ERROR"
FENCE_FAILED = "FENCE_FAILED"
TRANSITION_FAILED = "TRANSITION_FAILED"
FAILOVER_OK = "FAILOVER_OK"


def recheck_electability(nodes: DataFrame) -> DataFrame:
    """Per-node election decision on a health-state event.

    ``nodes``: (node_id, health_state, service_state,
    delay_remaining_ns long). Returns (node_id, action,
    new_service_state — INITIALIZING on the quit branches, NULL
    where the reference leaves it untouched)."""
    h = F.col("health_state")
    quit_branch = h.isin("SERVICE_UNHEALTHY", "SERVICE_NOT_RESPONDING")
    action = (
        F.when(F.col("delay_remaining_ns") > 0, DELAYED_RECHECK)
        .when(
            h == HEALTHY,
            F.when(
                F.col("service_state") == "OBSERVER", OBSERVER_NO_JOIN
            ).otherwise(JOIN_ELECTION),
        )
        .when(h == "INITIALIZING", QUIT_NO_FENCE)
        .when(quit_branch, QUIT_NEED_FENCE)
        .otherwise(FATAL)
    )
    new_state = F.when(
        (F.col("delay_remaining_ns") <= 0)
        & (h.isin("INITIALIZING") | quit_branch),
        "INITIALIZING",
    )
    return nodes.select(
        "node_id",
        action.alias("action"),
        new_state.alias("new_service_state"),
    )


def _attempt_outcome() -> tuple[Column, Column]:
    """(failure verdict or NULL, how the old active was fenced)."""
    peer = F.col("breadcrumb") == "peer"
    fence_fail = (
        F.when(
            peer & ~F.col("graceful_fence_ok"),
            F.when(~F.col("fencer_configured"), FENCE_CONFIG_ERROR).when(
                ~F.col("fencer_ok"), FENCE_FAILED
            ),
        )
    )
    failure = F.coalesce(
        fence_fail,
        F.when(~F.col("transition_rpc_ok"), TRANSITION_FAILED),
    )
    fenced = (
        F.when(~peer, "not_needed")
        .when(F.col("graceful_fence_ok"), "graceful")
        .when(fence_fail.isNull(), "fencer")
    )
    return failure, fenced


def graceful_failover_plan(requests: DataFrame) -> DataFrame:
    """Outcome matrix for manually requested graceful failovers.

    ``requests``: (req_id, health_state, service_state,
    local_addr, active_addr nullable, attempt_made boolean — whether
    ZooKeeper granted the local elector an active attempt within the
    wait, health_during_wait, breadcrumb 'none'|'self'|'peer',
    graceful_fence_ok, fencer_configured, fencer_ok,
    transition_rpc_ok booleans).

    Returns (req_id, verdict, fenced — 'graceful'|'fencer'|
    'not_needed' on rows whose attempt ran a successful fence phase,
    NULL elsewhere)."""
    failure, fenced = _attempt_outcome()
    verdict = (
        F.when(F.col("health_state") != HEALTHY, NOT_HEALTHY)
        .when(F.col("service_state") == "OBSERVER", OBSERVER_TARGET)
        .when(F.col("active_addr").isNull(), NO_ACTIVE)
        .when(F.col("active_addr") == F.col("local_addr"), ALREADY_ACTIVE)
        .when(
            ~F.col("attempt_made")
            & (F.col("health_during_wait") != HEALTHY),
            UNHEALTHY_DURING_WAIT,
        )
        .when(~F.col("attempt_made"), ELECTION_TIMEOUT)
        .otherwise(F.coalesce(failure, F.lit(FAILOVER_OK)))
    )
    attempt_ran = verdict.isin(
        FAILOVER_OK, TRANSITION_FAILED, FENCE_CONFIG_ERROR, FENCE_FAILED
    )
    return requests.select(
        "req_id",
        verdict.alias("verdict"),
        F.when(
            attempt_ran & ~verdict.isin(FENCE_CONFIG_ERROR, FENCE_FAILED),
            fenced,
        ).alias("fenced"),
    )
