"""CS ActivitiesManager decision-matrix pins (ActivitiesManager.java,
ActivityDiagnosticConstant.java, CapacityScheduler.java:1609-1797,
ParentQueue.java:548-619, LeafQueue.java:1142-1289,
RegularContainerAllocator.java:100-885,
AbstractContainerAllocator.java:71-165)."""

from __future__ import annotations

from hadoop_source_spark.operators import activities as act

DEFAULTS = dict(
    attempt_id=1, node_id="n1", app_id="a1",
    parent_path="root.eng", leaf_path="root.eng.batch",
    multi_node=False, ignore_exclusivity=False,
    node_removed=False, node_reserved=False,
    node_avail=4096, node_killable=0, node_total=8192, min_alloc=1024,
    part_used_cap=0.5, part_killable=0,
    parent_accessible=True, parent_pending=10, parent_over_max=False,
    leaf_accessible=True, leaf_pending=10, leaf_over_max=False,
    user_assignable=True, app_has_pending=True,
    any_ask=2, outstanding=2, waiting_am=False, partition_match=True,
    continue_looking=True, should_alloc_or_reserve=True,
    headroom=100000, app_reserved=0, null_any_request=False,
    missed_nonpart=0, cluster_nodes=10,
    blacklisted=False, node_ask=0, rack_ask=0,
    can_delay_rack=True, can_delay_any=True,
    sched_opps=0, node_delay=4, rack_extra_delay=-1, uniq_asks=1,
    capability=1024, preemption_allowed=False,
    need_unreserve=False, found_unreserve=False,
    container_create_fail=False, alloc_race_fail=False,
)

COLS = list(DEFAULTS)
SCHEMA = ", ".join(
    f"{k} {'boolean' if isinstance(v, bool) else 'double' if isinstance(v, float) else 'long' if isinstance(v, int) else 'string'}"
    for k, v in DEFAULTS.items()
)


def run(spark, **over):
    row = {**DEFAULTS, **over}
    df = spark.createDataFrame([tuple(row[k] for k in COLS)], SCHEMA)
    (out,) = act.allocation_activities(df).collect()
    return out


def test_init_checks(spark):
    r = run(spark, node_removed=True)
    assert (r["level"], r["state"], r["diagnostic"], r["queue"]) == (
        "QUEUE", "REJECTED", "INIT_CHECK_SINGLE_NODE_REMOVED", "root")
    r = run(spark, node_avail=100, node_killable=0)
    assert r["diagnostic"] == "INIT_CHECK_SINGLE_NODE_RESOURCE_INSUFFICIENT"
    # killable resource rescues the minimum-allocation check, but
    # assignContainer only counts it under preemption -> RESERVED
    r = run(spark, node_avail=100, node_killable=2048)
    assert r["state"] == "RESERVED"
    r = run(spark, node_avail=100, node_killable=2048,
            preemption_allowed=True)
    assert r["state"] == "ALLOCATED"
    r = run(spark, multi_node=True, part_used_cap=1.0, part_killable=0)
    assert r["diagnostic"] == "INIT_CHECK_PARTITION_RESOURCE_INSUFFICIENT"
    # killable resource in the partition lets multi-node proceed
    r = run(spark, multi_node=True, part_used_cap=1.0, part_killable=5)
    assert r["state"] == "ALLOCATED"


def test_reserved_fulfill_path(spark):
    # release: no outstanding asks -> nothing recorded, queue echoes
    # the headroom diagnostic (QUEUE_SKIPPED -> SkippedType.QUEUE_LIMIT)
    r = run(spark, node_reserved=True, outstanding=0)
    assert (r["state"], r["diagnostic"]) == ("SKIPPED", None)
    assert (r["echo_state"], r["echo_diag"]) == (
        "REJECTED", "QUEUE_DO_NOT_HAVE_ENOUGH_HEADROOM")
    # fulfill allocates when space opened up
    r = run(spark, node_reserved=True)
    assert (r["state"], r["alloc_type"]) == ("ALLOCATED", "OFF_SWITCH")
    # re-reserve when still no space
    r = run(spark, node_reserved=True, node_avail=2048,
            capability=4096)
    assert r["state"] == "RE_RESERVED"
    assert r["diagnostic"] == "NODE_DO_NOT_HAVE_SUFFICIENT_RESOURCE"
    # the reserved path skips every queue/app/request pre-check
    r = run(spark, node_reserved=True, leaf_over_max=True,
            user_assignable=False, headroom=0)
    assert r["state"] == "ALLOCATED"
    # blacklist still applies
    r = run(spark, node_reserved=True, blacklisted=True)
    assert r["diagnostic"] == "NODE_IS_BLACKLISTED"
    assert r["echo_state"] is None
    # no ask at all: the walk's terminal record (dead for new
    # allocations -- the pre-check requires an off-switch ask)
    r = run(spark, node_reserved=True, any_ask=0)
    assert r["diagnostic"] == (
        "NODE_SKIPPED_BECAUSE_OF_NO_OFF_SWITCH_AND_LOCALITY_VIOLATION")
    assert (r["echo_state"], r["echo_diag"]) == (
        "SKIPPED", "QUEUE_SKIPPED_TO_RESPECT_FIFO")


def test_queue_gates_in_order(spark):
    r = run(spark, parent_accessible=False)
    assert (r["queue"], r["diagnostic"]) == (
        "root.eng", "QUEUE_NOT_ABLE_TO_ACCESS_PARTITION")
    # IGNORE_PARTITION_EXCLUSIVITY bypasses accessibility
    r = run(spark, parent_accessible=False, ignore_exclusivity=True,
            missed_nonpart=99)
    assert r["state"] == "ALLOCATED"
    r = run(spark, parent_pending=0)
    assert (r["state"], r["diagnostic"]) == (
        "SKIPPED", "QUEUE_DO_NOT_NEED_MORE_RESOURCE")
    r = run(spark, parent_over_max=True)
    assert r["diagnostic"] == "QUEUE_HIT_MAX_CAPACITY_LIMIT"
    r = run(spark, leaf_accessible=False)
    assert r["queue"] == "root.eng.batch"
    r = run(spark, leaf_pending=0)
    assert (r["queue"], r["diagnostic"]) == (
        "root.eng.batch", "QUEUE_DO_NOT_NEED_MORE_RESOURCE")


def test_app_gates(spark):
    r = run(spark, leaf_over_max=True)
    assert (r["level"], r["diagnostic"]) == (
        "APP", "QUEUE_HIT_MAX_CAPACITY_LIMIT")
    assert r["echo_state"] == "REJECTED"
    r = run(spark, user_assignable=False)
    assert r["diagnostic"] == "QUEUE_HIT_USER_MAX_CAPACITY_LIMIT"
    assert r["echo_state"] is None  # app loop continues
    r = run(spark, app_has_pending=False)
    assert (r["state"], r["diagnostic"]) == (
        "SKIPPED", "APPLICATION_DO_NOT_NEED_RESOURCE")


def test_request_prechecks(spark):
    r = run(spark, any_ask=0)
    assert r["diagnostic"] == "REQUEST_DO_NOT_NEED_RESOURCE"
    assert r["echo_diag"] == "QUEUE_SKIPPED_TO_RESPECT_FIFO"
    r = run(spark, ignore_exclusivity=True, waiting_am=True,
            missed_nonpart=99)
    assert r["diagnostic"] == "REQUEST_SKIPPED_IN_IGNORE_EXCLUSIVITY_MODE"
    r = run(spark, partition_match=False)
    assert (r["level"], r["diagnostic"]) == (
        "NODE", "NODE_DO_NOT_MATCH_PARTITION_OR_PLACEMENT_CONSTRAINTS")
    r = run(spark, continue_looking=False, should_alloc_or_reserve=False)
    assert r["diagnostic"] == "REQUEST_SKIPPED_BECAUSE_OF_RESERVATION"
    r = run(spark, headroom=0)
    assert (r["state"], r["diagnostic"]) == (
        "REJECTED", "QUEUE_DO_NOT_HAVE_ENOUGH_HEADROOM")
    assert r["echo_diag"] == "QUEUE_DO_NOT_HAVE_ENOUGH_HEADROOM"
    # continuous looking counts the app's own reservation as headroom
    r = run(spark, headroom=0, app_reserved=2048)
    assert r["state"] == "ALLOCATED"
    r = run(spark, null_any_request=True)
    assert r["diagnostic"] == "REQUEST_SKIPPED_BECAUSE_NULL_ANY_REQUEST"
    r = run(spark, ignore_exclusivity=True, missed_nonpart=3,
            cluster_nodes=10)
    assert r["diagnostic"] == (
        "REQUEST_SKIPPED_BECAUSE_NON_PARTITIONED_PARTITION_FIRST")


def test_locality_walk(spark):
    # node-local needs an outstanding rack ask too (canAssign:345-364)
    r = run(spark, node_ask=1, rack_ask=1)
    assert (r["state"], r["alloc_type"]) == ("ALLOCATED", "NODE_LOCAL")
    # relax locality forbidden at rack level
    r = run(spark, rack_ask=1, can_delay_rack=False)
    assert r["diagnostic"] == "NODE_SKIPPED_BECAUSE_OF_RELAX_LOCALITY"
    # rack delay not yet met -> falls to off-switch; uniq==1 allocates
    r = run(spark, rack_ask=1, sched_opps=0, node_delay=4, uniq_asks=1)
    assert (r["state"], r["alloc_type"]) == ("ALLOCATED", "RACK_LOCAL")
    # rack delay met -> rack-local allocation
    r = run(spark, rack_ask=1, sched_opps=5, node_delay=4)
    assert (r["state"], r["alloc_type"]) == ("ALLOCATED", "RACK_LOCAL")
    # off-switch delay: several unique asks, no missed opportunities
    r = run(spark, uniq_asks=5, sched_opps=0)
    assert r["diagnostic"] == "NODE_SKIPPED_BECAUSE_OF_OFF_SWITCH_DELAY"
    assert r["echo_state"] is None  # APP_SKIPPED -> no echo
    # ... but enough missed opportunities pass the wait factor
    r = run(spark, uniq_asks=5, sched_opps=9, outstanding=10)
    assert r["state"] == "ALLOCATED"
    # rack-additional-delay mode
    r = run(spark, uniq_asks=5, sched_opps=9, rack_extra_delay=2,
            node_delay=4)
    assert r["state"] == "ALLOCATED"
    r = run(spark, uniq_asks=5, sched_opps=6, rack_extra_delay=2,
            node_delay=4)
    assert r["diagnostic"] == "NODE_SKIPPED_BECAUSE_OF_OFF_SWITCH_DELAY"
    r = run(spark, can_delay_any=False)
    assert r["diagnostic"] == "NODE_SKIPPED_BECAUSE_OF_RELAX_LOCALITY"


def test_assign_container_outcomes(spark):
    # total resource insufficient at off-switch -> APP skip, no echo
    r = run(spark, capability=9000, node_total=8192)
    assert r["diagnostic"] == (
        "NODE_TOTAL_RESOURCE_INSUFFICIENT_FOR_REQUEST")
    assert r["echo_state"] is None
    # no space, shouldAllocOrReserve -> RESERVED (echo ACCEPTED)
    r = run(spark, node_avail=2048, capability=4096,
            continue_looking=False)
    assert (r["state"], r["echo_state"]) == ("RESERVED", "ACCEPTED")
    assert r["diagnostic"] == "NODE_DO_NOT_HAVE_SUFFICIENT_RESOURCE"
    # continuous looking + need unreserve denies the new reservation
    r = run(spark, node_avail=2048, capability=4096,
            need_unreserve=True)
    assert (r["state"], r["diagnostic"]) == (
        "SKIPPED", "NODE_DO_NOT_HAVE_SUFFICIENT_RESOURCE")
    # no space and no right to reserve
    r = run(spark, node_avail=2048, capability=4096,
            continue_looking=False, should_alloc_or_reserve=True)
    assert r["state"] == "RESERVED"
    # unreserve needed but no container found
    r = run(spark, need_unreserve=True, found_unreserve=False)
    assert r["diagnostic"] == (
        "NODE_CAN_NOT_FIND_CONTAINER_TO_BE_UNRESERVED_WHEN_NEEDED")
    r = run(spark, need_unreserve=True, found_unreserve=True)
    assert r["state"] == "ALLOCATED"
    # should-not-alloc under continuous looking also needs unreserve
    r = run(spark, should_alloc_or_reserve=False, found_unreserve=False)
    assert r["diagnostic"] == (
        "NODE_CAN_NOT_FIND_CONTAINER_TO_BE_UNRESERVED_WHEN_NEEDED")
    # preemption: killable containers count toward space
    r = run(spark, node_avail=2048, capability=4096,
            preemption_allowed=True, node_killable=4096)
    assert r["state"] == "ALLOCATED"


def test_post_allocation_races(spark):
    r = run(spark, container_create_fail=True)
    assert (r["level"], r["state"], r["diagnostic"]) == (
        "APP", "REJECTED", "APPLICATION_COULD_NOT_GET_CONTAINER")
    r = run(spark, alloc_race_fail=True)
    assert r["diagnostic"] == "APPLICATION_FAIL_TO_ALLOCATE"
    # races never fire on the reserved fulfill path
    r = run(spark, node_reserved=True, container_create_fail=True,
            min_alloc=0)
    assert r["state"] == "ALLOCATED"


def test_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [tuple(DEFAULTS[k] for k in COLS)], SCHEMA)
    plan = act.allocation_activities(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
