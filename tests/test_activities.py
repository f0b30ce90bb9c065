"""CS ActivitiesManager decision-matrix pins (ActivitiesManager.java,
ActivityDiagnosticConstant.java, CapacityScheduler.java:1609-1797,
ParentQueue.java:548-619, LeafQueue.java:1142-1289,
RegularContainerAllocator.java:100-885,
AbstractContainerAllocator.java:71-165).

Each test batches ALL its scenarios into ONE DataFrame (keyed by
attempt_id) and runs the operator once (r15): the operator's cost is
constant driver-side analysis of the diagnostic expression tree
(~1.5-2 s), so the previous one-row-per-collect shape paid that
analysis ~54 times and dominated the whole suite's wall clock. Every
scenario and assertion is unchanged — only the batching is new."""

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


def runs(spark, cases):
    """One operator invocation for a whole scenario list: row i carries
    attempt_id=i, and the returned rows come back in case order."""
    data = []
    for i, over in enumerate(cases):
        row = {**DEFAULTS, **over, "attempt_id": i}
        data.append(tuple(row[k] for k in COLS))
    out = act.allocation_activities(
        spark.createDataFrame(data, SCHEMA)
    ).collect()
    assert len(out) == len(cases)
    return sorted(out, key=lambda r: r["attempt_id"])


CASES = {
    'init_checks': [
            dict(node_removed=True),
            dict(node_avail=100, node_killable=0),
            # killable resource rescues the minimum-allocation check, but
            # assignContainer only counts it under preemption -> RESERVED
            dict(node_avail=100, node_killable=2048),
            dict(node_avail=100, node_killable=2048, preemption_allowed=True),
            dict(multi_node=True, part_used_cap=1.0, part_killable=0),
            # killable resource in the partition lets multi-node proceed
            dict(multi_node=True, part_used_cap=1.0, part_killable=5),
    ],
    'reserved_fulfill_path': [
            # release: no outstanding asks -> nothing recorded, queue echoes
            # the headroom diagnostic (QUEUE_SKIPPED -> SkippedType.QUEUE_LIMIT)
            dict(node_reserved=True, outstanding=0),
            # fulfill allocates when space opened up
            dict(node_reserved=True),
            # re-reserve when still no space
            dict(node_reserved=True, node_avail=2048, capability=4096),
            # the reserved path skips every queue/app/request pre-check
            dict(node_reserved=True, leaf_over_max=True,
                 user_assignable=False, headroom=0),
            # blacklist still applies
            dict(node_reserved=True, blacklisted=True),
            # no ask at all: the walk's terminal record (dead for new
            # allocations -- the pre-check requires an off-switch ask)
            dict(node_reserved=True, any_ask=0),
    ],
    'queue_gates_in_order': [
            dict(parent_accessible=False),
            # IGNORE_PARTITION_EXCLUSIVITY bypasses accessibility
            dict(parent_accessible=False, ignore_exclusivity=True,
                 missed_nonpart=99),
            dict(parent_pending=0),
            dict(parent_over_max=True),
            dict(leaf_accessible=False),
            dict(leaf_pending=0),
    ],
    'app_gates': [
            dict(leaf_over_max=True),
            dict(user_assignable=False),
            dict(app_has_pending=False),
    ],
    'request_prechecks': [
            dict(any_ask=0),
            dict(ignore_exclusivity=True, waiting_am=True, missed_nonpart=99),
            dict(partition_match=False),
            dict(continue_looking=False, should_alloc_or_reserve=False),
            dict(headroom=0),
            # continuous looking counts the app's own reservation as headroom
            dict(headroom=0, app_reserved=2048),
            dict(null_any_request=True),
            dict(ignore_exclusivity=True, missed_nonpart=3, cluster_nodes=10),
    ],
    'locality_walk': [
            # node-local needs an outstanding rack ask too (canAssign:345-364)
            dict(node_ask=1, rack_ask=1),
            # relax locality forbidden at rack level
            dict(rack_ask=1, can_delay_rack=False),
            # rack delay not yet met -> falls to off-switch; uniq==1 allocates
            dict(rack_ask=1, sched_opps=0, node_delay=4, uniq_asks=1),
            # rack delay met -> rack-local allocation
            dict(rack_ask=1, sched_opps=5, node_delay=4),
            # off-switch delay: several unique asks, no missed opportunities
            dict(uniq_asks=5, sched_opps=0),
            # ... but enough missed opportunities pass the wait factor
            dict(uniq_asks=5, sched_opps=9, outstanding=10),
            # rack-additional-delay mode
            dict(uniq_asks=5, sched_opps=9, rack_extra_delay=2, node_delay=4),
            dict(uniq_asks=5, sched_opps=6, rack_extra_delay=2, node_delay=4),
            dict(can_delay_any=False),
    ],
    'assign_container_outcomes': [
            # total resource insufficient at off-switch -> APP skip, no echo
            dict(capability=9000, node_total=8192),
            # no space, shouldAllocOrReserve -> RESERVED (echo ACCEPTED)
            dict(node_avail=2048, capability=4096, continue_looking=False),
            # continuous looking + need unreserve denies the new reservation
            dict(node_avail=2048, capability=4096, need_unreserve=True),
            # no space and no right to reserve
            dict(node_avail=2048, capability=4096, continue_looking=False,
                 should_alloc_or_reserve=True),
            # unreserve needed but no container found
            dict(need_unreserve=True, found_unreserve=False),
            dict(need_unreserve=True, found_unreserve=True),
            # should-not-alloc under continuous looking also needs unreserve
            dict(should_alloc_or_reserve=False, found_unreserve=False),
            # preemption: killable containers count toward space
            dict(node_avail=2048, capability=4096, preemption_allowed=True,
                 node_killable=4096),
    ],
    'post_allocation_races': [
            dict(container_create_fail=True),
            dict(alloc_race_fail=True),
            # races never fire on the reserved fulfill path
            dict(node_reserved=True, container_create_fail=True, min_alloc=0),
    ],
}


import pytest


@pytest.fixture(scope="module")
def all_results(spark):
    """ONE operator invocation for every scenario in the module (r15):
    the operator's cost is constant driver-side expression analysis, so
    batching all ~40 scenarios into a single DataFrame pays it once."""
    flat, keys = [], []
    for group, group_cases in CASES.items():
        for case in group_cases:
            keys.append(group)
            flat.append(case)
    rows = runs(spark, flat)
    out = {}
    for group, row in zip(keys, rows):
        out.setdefault(group, []).append(row)
    return out



def test_init_checks(all_results):
    r = all_results['init_checks']
    assert (r[0]["level"], r[0]["state"], r[0]["diagnostic"], r[0]["queue"]) == (
        "QUEUE", "REJECTED", "INIT_CHECK_SINGLE_NODE_REMOVED", "root")
    assert r[1]["diagnostic"] == "INIT_CHECK_SINGLE_NODE_RESOURCE_INSUFFICIENT"
    assert r[2]["state"] == "RESERVED"
    assert r[3]["state"] == "ALLOCATED"
    assert r[4]["diagnostic"] == "INIT_CHECK_PARTITION_RESOURCE_INSUFFICIENT"
    assert r[5]["state"] == "ALLOCATED"


def test_reserved_fulfill_path(all_results):
    r = all_results['reserved_fulfill_path']
    assert (r[0]["state"], r[0]["diagnostic"]) == ("SKIPPED", None)
    assert (r[0]["echo_state"], r[0]["echo_diag"]) == (
        "REJECTED", "QUEUE_DO_NOT_HAVE_ENOUGH_HEADROOM")
    assert (r[1]["state"], r[1]["alloc_type"]) == ("ALLOCATED", "OFF_SWITCH")
    assert r[2]["state"] == "RE_RESERVED"
    assert r[2]["diagnostic"] == "NODE_DO_NOT_HAVE_SUFFICIENT_RESOURCE"
    assert r[3]["state"] == "ALLOCATED"
    assert r[4]["diagnostic"] == "NODE_IS_BLACKLISTED"
    assert r[4]["echo_state"] is None
    assert r[5]["diagnostic"] == (
        "NODE_SKIPPED_BECAUSE_OF_NO_OFF_SWITCH_AND_LOCALITY_VIOLATION")
    assert (r[5]["echo_state"], r[5]["echo_diag"]) == (
        "SKIPPED", "QUEUE_SKIPPED_TO_RESPECT_FIFO")


def test_queue_gates_in_order(all_results):
    r = all_results['queue_gates_in_order']
    assert (r[0]["queue"], r[0]["diagnostic"]) == (
        "root.eng", "QUEUE_NOT_ABLE_TO_ACCESS_PARTITION")
    assert r[1]["state"] == "ALLOCATED"
    assert (r[2]["state"], r[2]["diagnostic"]) == (
        "SKIPPED", "QUEUE_DO_NOT_NEED_MORE_RESOURCE")
    assert r[3]["diagnostic"] == "QUEUE_HIT_MAX_CAPACITY_LIMIT"
    assert r[4]["queue"] == "root.eng.batch"
    assert (r[5]["queue"], r[5]["diagnostic"]) == (
        "root.eng.batch", "QUEUE_DO_NOT_NEED_MORE_RESOURCE")


def test_app_gates(all_results):
    r = all_results['app_gates']
    assert (r[0]["level"], r[0]["diagnostic"]) == (
        "APP", "QUEUE_HIT_MAX_CAPACITY_LIMIT")
    assert r[0]["echo_state"] == "REJECTED"
    assert r[1]["diagnostic"] == "QUEUE_HIT_USER_MAX_CAPACITY_LIMIT"
    assert r[1]["echo_state"] is None  # app loop continues
    assert (r[2]["state"], r[2]["diagnostic"]) == (
        "SKIPPED", "APPLICATION_DO_NOT_NEED_RESOURCE")


def test_request_prechecks(all_results):
    r = all_results['request_prechecks']
    assert r[0]["diagnostic"] == "REQUEST_DO_NOT_NEED_RESOURCE"
    assert r[0]["echo_diag"] == "QUEUE_SKIPPED_TO_RESPECT_FIFO"
    assert r[1]["diagnostic"] == "REQUEST_SKIPPED_IN_IGNORE_EXCLUSIVITY_MODE"
    assert (r[2]["level"], r[2]["diagnostic"]) == (
        "NODE", "NODE_DO_NOT_MATCH_PARTITION_OR_PLACEMENT_CONSTRAINTS")
    assert r[3]["diagnostic"] == "REQUEST_SKIPPED_BECAUSE_OF_RESERVATION"
    assert (r[4]["state"], r[4]["diagnostic"]) == (
        "REJECTED", "QUEUE_DO_NOT_HAVE_ENOUGH_HEADROOM")
    assert r[4]["echo_diag"] == "QUEUE_DO_NOT_HAVE_ENOUGH_HEADROOM"
    assert r[5]["state"] == "ALLOCATED"
    assert r[6]["diagnostic"] == "REQUEST_SKIPPED_BECAUSE_NULL_ANY_REQUEST"
    assert r[7]["diagnostic"] == (
        "REQUEST_SKIPPED_BECAUSE_NON_PARTITIONED_PARTITION_FIRST")


def test_locality_walk(all_results):
    r = all_results['locality_walk']
    assert (r[0]["state"], r[0]["alloc_type"]) == ("ALLOCATED", "NODE_LOCAL")
    assert r[1]["diagnostic"] == "NODE_SKIPPED_BECAUSE_OF_RELAX_LOCALITY"
    assert (r[2]["state"], r[2]["alloc_type"]) == ("ALLOCATED", "RACK_LOCAL")
    assert (r[3]["state"], r[3]["alloc_type"]) == ("ALLOCATED", "RACK_LOCAL")
    assert r[4]["diagnostic"] == "NODE_SKIPPED_BECAUSE_OF_OFF_SWITCH_DELAY"
    assert r[4]["echo_state"] is None  # APP_SKIPPED -> no echo
    assert r[5]["state"] == "ALLOCATED"
    assert r[6]["state"] == "ALLOCATED"
    assert r[7]["diagnostic"] == "NODE_SKIPPED_BECAUSE_OF_OFF_SWITCH_DELAY"
    assert r[8]["diagnostic"] == "NODE_SKIPPED_BECAUSE_OF_RELAX_LOCALITY"


def test_assign_container_outcomes(all_results):
    r = all_results['assign_container_outcomes']
    assert r[0]["diagnostic"] == (
        "NODE_TOTAL_RESOURCE_INSUFFICIENT_FOR_REQUEST")
    assert r[0]["echo_state"] is None
    assert (r[1]["state"], r[1]["echo_state"]) == ("RESERVED", "ACCEPTED")
    assert r[1]["diagnostic"] == "NODE_DO_NOT_HAVE_SUFFICIENT_RESOURCE"
    assert (r[2]["state"], r[2]["diagnostic"]) == (
        "SKIPPED", "NODE_DO_NOT_HAVE_SUFFICIENT_RESOURCE")
    assert r[3]["state"] == "RESERVED"
    assert r[4]["diagnostic"] == (
        "NODE_CAN_NOT_FIND_CONTAINER_TO_BE_UNRESERVED_WHEN_NEEDED")
    assert r[5]["state"] == "ALLOCATED"
    assert r[6]["diagnostic"] == (
        "NODE_CAN_NOT_FIND_CONTAINER_TO_BE_UNRESERVED_WHEN_NEEDED")
    assert r[7]["state"] == "ALLOCATED"


def test_post_allocation_races(all_results):
    r = all_results['post_allocation_races']
    assert (r[0]["level"], r[0]["state"], r[0]["diagnostic"]) == (
        "APP", "REJECTED", "APPLICATION_COULD_NOT_GET_CONTAINER")
    assert r[1]["diagnostic"] == "APPLICATION_FAIL_TO_ALLOCATE"
    assert r[2]["state"] == "ALLOCATED"


def test_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [tuple(DEFAULTS[k] for k in COLS)], SCHEMA)
    plan = act.allocation_activities(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
