"""ZKFC failover decision pins (ZKFailoverController.java
recheckElectability:801-852, doGracefulFailover:654-731,
checkEligibleForFailover:756-771, doFence:536-559;
ActiveStandbyElector.becomeActive:889-909, fenceOldActive:954-985).
"""

from __future__ import annotations

from hadoop_source_spark.operators import zkfc

R_SCHEMA = (
    "req_id long, health_state string, service_state string,"
    " local_addr string, active_addr string, attempt_made boolean,"
    " health_during_wait string, breadcrumb string,"
    " graceful_fence_ok boolean, fencer_configured boolean,"
    " fencer_ok boolean, transition_rpc_ok boolean"
)

OK = dict(
    health_state="SERVICE_HEALTHY", service_state="STANDBY",
    local_addr="nn1", active_addr="nn2", attempt_made=True,
    health_during_wait="SERVICE_HEALTHY", breadcrumb="peer",
    graceful_fence_ok=True, fencer_configured=True, fencer_ok=True,
    transition_rpc_ok=True,
)


def _plan(spark, rows):
    data = []
    for i, over in enumerate(rows):
        d = {**OK, **over}
        data.append((i,) + tuple(d[k] for k in (
            "health_state", "service_state", "local_addr", "active_addr",
            "attempt_made", "health_during_wait", "breadcrumb",
            "graceful_fence_ok", "fencer_configured", "fencer_ok",
            "transition_rpc_ok")))
    out = zkfc.graceful_failover_plan(
        spark.createDataFrame(data, R_SCHEMA)
    ).collect()
    return {r["req_id"]: r for r in out}


def test_eligibility_and_active_discovery_order(spark):
    got = _plan(spark, [
        {},                                                    # 0
        {"health_state": "SERVICE_UNHEALTHY"},                 # 1
        {"service_state": "OBSERVER"},                         # 2
        {"active_addr": None},                                 # 3
        {"active_addr": "nn1"},                                # 4
        # health check precedes the observer check
        {"health_state": "INITIALIZING",
         "service_state": "OBSERVER"},                         # 5
    ])
    assert got[0]["verdict"] == "FAILOVER_OK"
    assert got[0]["fenced"] == "graceful"
    assert got[1]["verdict"] == "NOT_HEALTHY"
    assert got[2]["verdict"] == "OBSERVER_TARGET"
    assert got[3]["verdict"] == "NO_ACTIVE"
    assert got[4]["verdict"] == "ALREADY_ACTIVE"
    assert got[4]["fenced"] is None
    assert got[5]["verdict"] == "NOT_HEALTHY"


def test_no_attempt_paths(spark):
    got = _plan(spark, [
        {"attempt_made": False,
         "health_during_wait": "SERVICE_NOT_RESPONDING"},
        {"attempt_made": False},
    ])
    assert got[0]["verdict"] == "UNHEALTHY_DURING_WAIT"
    assert got[1]["verdict"] == "ELECTION_TIMEOUT"


def test_fence_chain(spark):
    got = _plan(spark, [
        # graceful fence fails, fencer succeeds
        {"graceful_fence_ok": False},                              # 0
        # graceful fails, no fencer configured -> config error
        {"graceful_fence_ok": False, "fencer_configured": False},  # 1
        # graceful fails, fencer fails
        {"graceful_fence_ok": False, "fencer_ok": False},          # 2
        # own breadcrumb: no fence needed even with all fencing off
        {"breadcrumb": "self", "graceful_fence_ok": False,
         "fencer_configured": False},                              # 3
        {"breadcrumb": "none", "graceful_fence_ok": False,
         "fencer_configured": False},                              # 4
        # fence fine but transitionToActive RPC fails
        {"transition_rpc_ok": False},                              # 5
    ])
    assert (got[0]["verdict"], got[0]["fenced"]) == (
        "FAILOVER_OK", "fencer")
    assert got[1]["verdict"] == "FENCE_CONFIG_ERROR"
    assert got[1]["fenced"] is None
    assert got[2]["verdict"] == "FENCE_FAILED"
    assert (got[3]["verdict"], got[3]["fenced"]) == (
        "FAILOVER_OK", "not_needed")
    assert (got[4]["verdict"], got[4]["fenced"]) == (
        "FAILOVER_OK", "not_needed")
    assert (got[5]["verdict"], got[5]["fenced"]) == (
        "TRANSITION_FAILED", "graceful")


def test_recheck_electability_matrix(spark):
    nodes = spark.createDataFrame(
        [
            (0, "SERVICE_HEALTHY", "STANDBY", 0),
            (1, "SERVICE_HEALTHY", "OBSERVER", 0),
            (2, "INITIALIZING", "STANDBY", 0),
            (3, "SERVICE_UNHEALTHY", "STANDBY", 0),
            (4, "SERVICE_NOT_RESPONDING", "ACTIVE", 0),
            (5, "HEALTH_MONITOR_FAILED", "STANDBY", 0),
            # a pending join delay defers even an unhealthy node
            (6, "SERVICE_UNHEALTHY", "STANDBY", 500),
        ],
        "node_id long, health_state string, service_state string,"
        " delay_remaining_ns long",
    )
    got = {r["node_id"]: r
           for r in zkfc.recheck_electability(nodes).collect()}
    assert got[0]["action"] == "JOIN_ELECTION"
    assert got[1]["action"] == "OBSERVER_NO_JOIN"
    assert got[2]["action"] == "QUIT_NO_FENCE"
    assert got[2]["new_service_state"] == "INITIALIZING"
    assert got[3]["action"] == "QUIT_NEED_FENCE"
    assert got[4]["action"] == "QUIT_NEED_FENCE"
    assert got[4]["new_service_state"] == "INITIALIZING"
    assert got[5]["action"] == "FATAL"
    assert got[6]["action"] == "DELAYED_RECHECK"
    assert got[6]["new_service_state"] is None
    assert got[0]["new_service_state"] is None
