"""YARN service framework state rollup: service spec → component
instance state counts → reported component states → the service
state and per-component upgrade readiness.

Reference semantics (`hadoop-yarn-applications/hadoop-yarn-services/
hadoop-yarn-services-core/.../service/`):

- Instance states: `api/records/ContainerState.java:28-33`
  (RUNNING_BUT_UNREADY, READY, STOPPED, NEEDS_UPGRADE, UPGRADING,
  SUCCEEDED, FAILED, FAILED_UPGRADE).
- Component state (`component/Component.java checkIfStable:484-529`):
  long-lived components (ALWAYS restart policy,
  `AlwaysRestartPolicy.java`) are STABLE when ready == desired and no
  upgrade is in flight, NEEDS_UPGRADE while containers are upgrading
  or an upgrade failed (``doesNeedUpgrade:916-920``), else FLEXING;
  terminating components (ON_FAILURE / NEVER) are FLEXING until
  running + succeeded + failed reaches desired, then STABLE
  (:493-506).
- Termination (`ServiceScheduler.java terminateServiceIfNeeded:
  951-1056` + the restart policies): ON_FAILURE terminates when
  succeeded == desired (failures relaunch,
  `OnFailureRestartPolicy.java:82-88`); NEVER when succeeded + failed
  == desired (`NeverRestartPolicy.java:76-83`); ALWAYS never. A
  terminated component reports SUCCEEDED when every instance
  succeeded, else FAILED. A DOMINANT component
  (CONTAINER_STATE_REPORT_AS_SERVICE_STATE, :962-989) that terminates
  takes the whole service with it; otherwise the service terminates
  when ALL components terminate, FAILED if any component had a failed
  instance (:997-1056).
- Live service state (`ServiceMaster.checkAndUpdateServiceState:
  285-310`): STABLE when every component is STABLE, else STARTED
  (only demoted from STABLE).
- Upgrade readiness (`utils/ServiceApiUtil.java
  validateAndResolveCompsStable:661-681`): a component upgrades from
  STABLE, and its upgradable instances are those in READY state.

Spark-first: one hash aggregate on the component grain, a when-chain
for the state machine, and one aggregate + broadcast join back for
the service grain — two shuffles total, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALWAYS = "ALWAYS"
ON_FAILURE = "ON_FAILURE"
NEVER = "NEVER"

TERMINAL_INSTANCE = ("SUCCEEDED", "FAILED", "STOPPED")


def service_state_rollup(
    components: DataFrame, instances: DataFrame
) -> DataFrame:
    """Roll instance states up to component and service states.

    ``components``: (service, component, desired long, restart_policy
    ALWAYS | ON_FAILURE | NEVER, containers_upgrading boolean,
    upgrade_failed boolean, is_dominant boolean).
    ``instances``: (service, component, instance_id, state — a
    ContainerState name).

    Returns one row per component: (service, component,
    restart_policy, desired, n_ready, n_running, n_succeeded,
    n_failed, comp_state, upgrade_ready boolean, n_upgradable long,
    service_state)."""
    st = F.col("state")
    counts = instances.groupBy("service", "component").agg(
        F.sum(F.when(st == "READY", 1).otherwise(0)).alias("n_ready"),
        F.sum(F.when(~st.isin(*TERMINAL_INSTANCE), 1).otherwise(0))
        .alias("n_running"),
        F.sum(F.when(st == "SUCCEEDED", 1).otherwise(0)).alias(
            "n_succeeded"
        ),
        F.sum(F.when(st == "FAILED", 1).otherwise(0)).alias("n_failed"),
    )
    c = (
        components.join(counts, ["service", "component"], "left")
        .fillna(
            0, ["n_ready", "n_running", "n_succeeded", "n_failed"]
        )
    )
    needs_upgrade = F.col("containers_upgrading") | F.col(
        "upgrade_failed"
    )
    long_lived = F.col("restart_policy") == ALWAYS
    should_terminate = (
        F.when(long_lived, F.lit(False))
        .when(
            F.col("restart_policy") == ON_FAILURE,
            F.col("n_succeeded") >= F.col("desired"),
        )
        .otherwise(
            F.col("n_succeeded") + F.col("n_failed") >= F.col("desired")
        )
    )
    live_state = (
        F.when(
            long_lived,
            F.when(needs_upgrade, "NEEDS_UPGRADE")
            .when(F.col("n_ready") == F.col("desired"), "STABLE")
            .otherwise("FLEXING"),
        )
        .otherwise(
            F.when(
                F.col("n_running")
                + F.col("n_succeeded")
                + F.col("n_failed")
                < F.col("desired"),
                "FLEXING",
            ).otherwise("STABLE")
        )
    )
    comp_state = F.when(
        should_terminate,
        F.when(
            F.col("n_succeeded") == F.col("desired"), "SUCCEEDED"
        ).otherwise("FAILED"),
    ).otherwise(live_state)
    c = c.select(
        "service", "component", "restart_policy", "desired",
        "n_ready", "n_running", "n_succeeded", "n_failed",
        "is_dominant",
        should_terminate.alias("_term"),
        comp_state.alias("comp_state"),
    )
    svc = c.groupBy("service").agg(
        F.max(
            F.when(
                F.col("is_dominant") & F.col("_term"),
                F.when(F.col("comp_state") == "SUCCEEDED", 2).otherwise(1),
            )
        ).alias("_dominant_exit"),
        F.min(F.col("_term").cast("int")).alias("_all_term"),
        F.max((F.col("n_failed") > 0).cast("int")).alias("_any_failed"),
        F.min((F.col("comp_state") == "STABLE").cast("int")).alias(
            "_all_stable"
        ),
    )
    service_state = (
        F.when(F.col("_dominant_exit") == 2, "SUCCEEDED")
        .when(F.col("_dominant_exit") == 1, "FAILED")
        .when(
            F.col("_all_term") == 1,
            F.when(F.col("_any_failed") == 1, "FAILED").otherwise(
                "SUCCEEDED"
            ),
        )
        .when(F.col("_all_stable") == 1, "STABLE")
        .otherwise("STARTED")
    )
    return c.join(
        F.broadcast(svc.select("service", service_state.alias(
            "service_state"))),
        "service",
    ).select(
        "service", "component", "restart_policy", "desired",
        "n_ready", "n_running", "n_succeeded", "n_failed",
        "comp_state",
        (F.col("comp_state") == "STABLE").alias("upgrade_ready"),
        F.col("n_ready").cast("long").alias("n_upgradable"),
        "service_state",
    )
