"""YARN service framework rollup pins (Component.java:484-529,916-920;
ServiceScheduler.java:951-1056; ServiceMaster.java:285-310;
AlwaysRestartPolicy / OnFailureRestartPolicy / NeverRestartPolicy;
ServiceApiUtil.java:661-681)."""

from __future__ import annotations

from hadoop_source_spark.operators import yarnservice as ys

C_SCHEMA = (
    "service string, component string, desired long,"
    " restart_policy string, containers_upgrading boolean,"
    " upgrade_failed boolean, is_dominant boolean"
)
I_SCHEMA = (
    "service string, component string, instance_id string, state string"
)


def run(spark, comps, insts):
    out = ys.service_state_rollup(
        spark.createDataFrame(comps, C_SCHEMA),
        spark.createDataFrame(insts, I_SCHEMA),
    ).collect()
    return {(r["service"], r["component"]): r for r in out}


def comp(svc, name, desired, policy=ys.ALWAYS, upgrading=False,
         upfail=False, dominant=False):
    return (svc, name, desired, policy, upgrading, upfail, dominant)


def test_long_lived_stable_flexing_needs_upgrade(spark):
    out = run(
        spark,
        [comp("s", "web", 2), comp("s", "db", 2),
         comp("s", "cache", 1, upgrading=True)],
        [("s", "web", "w0", "READY"), ("s", "web", "w1", "READY"),
         ("s", "db", "d0", "READY"),
         ("s", "db", "d1", "RUNNING_BUT_UNREADY"),
         ("s", "cache", "c0", "UPGRADING")],
    )
    assert out[("s", "web")]["comp_state"] == "STABLE"
    assert out[("s", "web")]["upgrade_ready"]
    assert out[("s", "web")]["n_upgradable"] == 2
    assert out[("s", "db")]["comp_state"] == "FLEXING"
    assert not out[("s", "db")]["upgrade_ready"]
    assert out[("s", "cache")]["comp_state"] == "NEEDS_UPGRADE"
    # not all components stable -> STARTED
    assert out[("s", "web")]["service_state"] == "STARTED"


def test_all_stable_service_stable(spark):
    out = run(
        spark,
        [comp("s", "web", 1)],
        [("s", "web", "w0", "READY")],
    )
    assert out[("s", "web")]["service_state"] == "STABLE"


def test_terminating_component_success_and_failure(spark):
    out = run(
        spark,
        [comp("s", "job", 2, policy=ys.NEVER),
         comp("s", "side", 1, policy=ys.ALWAYS)],
        [("s", "job", "j0", "SUCCEEDED"), ("s", "job", "j1", "FAILED"),
         ("s", "side", "x0", "READY")],
    )
    # NEVER terminates at succeeded+failed == desired; a failure makes
    # the component FAILED; the long-lived sibling keeps running and
    # the service stays STARTED (a FAILED component is not STABLE)
    assert out[("s", "job")]["comp_state"] == "FAILED"
    assert out[("s", "side")]["comp_state"] == "STABLE"
    assert out[("s", "job")]["service_state"] == "STARTED"


def test_on_failure_relaunches_until_all_succeed(spark):
    out = run(
        spark,
        [comp("s", "job", 2, policy=ys.ON_FAILURE)],
        [("s", "job", "j0", "SUCCEEDED"), ("s", "job", "j1", "FAILED")],
    )
    # ON_FAILURE does not terminate on failures (they relaunch):
    # running+succeeded+failed == desired -> STABLE, not FAILED
    assert out[("s", "job")]["comp_state"] == "STABLE"
    out = run(
        spark,
        [comp("s", "job", 2, policy=ys.ON_FAILURE)],
        [("s", "job", "j0", "SUCCEEDED"), ("s", "job", "j1", "SUCCEEDED")],
    )
    assert out[("s", "job")]["comp_state"] == "SUCCEEDED"
    assert out[("s", "job")]["service_state"] == "SUCCEEDED"


def test_all_components_finished_any_failure_fails_service(spark):
    out = run(
        spark,
        [comp("s", "a", 1, policy=ys.NEVER),
         comp("s", "b", 1, policy=ys.NEVER)],
        [("s", "a", "a0", "SUCCEEDED"), ("s", "b", "b0", "FAILED")],
    )
    assert out[("s", "a")]["comp_state"] == "SUCCEEDED"
    assert out[("s", "b")]["comp_state"] == "FAILED"
    assert out[("s", "a")]["service_state"] == "FAILED"


def test_dominant_component_takes_service_down(spark):
    out = run(
        spark,
        [comp("s", "main", 1, policy=ys.NEVER, dominant=True),
         comp("s", "web", 1, policy=ys.ALWAYS)],
        [("s", "main", "m0", "SUCCEEDED"), ("s", "web", "w0", "READY")],
    )
    # the dominant job finished successfully -> whole service SUCCEEDED
    # even though the long-lived web component never terminates
    assert out[("s", "main")]["comp_state"] == "SUCCEEDED"
    assert out[("s", "web")]["service_state"] == "SUCCEEDED"


def test_terminating_component_flexing_before_done(spark):
    out = run(
        spark,
        [comp("s", "job", 3, policy=ys.NEVER)],
        [("s", "job", "j0", "SUCCEEDED"),
         ("s", "job", "j1", "RUNNING_BUT_UNREADY")],
    )
    # 1 succeeded + 1 running < 3 desired -> FLEXING
    assert out[("s", "job")]["comp_state"] == "FLEXING"
