"""CapacityScheduler ActivitiesManager allocation diagnostics: the
"why is my app pending" decision matrix — for each allocation attempt
of an app on a node, the decisive activity record (level, state,
diagnostic) the RM's /scheduler/activities surface would show, plus
the leaf queue's echo record.

Reference semantics (`hadoop-yarn-server-resourcemanager/.../scheduler/`):

- Initial checks (`capacity/CapacityScheduler.java`): single-node
  mode checks removed node (:1609-1618); a node holding a reserved
  container routes to the FULFILL path (:1623-1631) — the leaf hands
  the app's allocator the reserved container directly, skipping every
  queue/app/request pre-check: the only gates are the outstanding-ask
  release check (`RegularContainerAllocator.allocate:866-873`, which
  records nothing and returns QUEUE_SKIPPED → the queue echoes the
  headroom diagnostic via SkippedType.QUEUE_LIMIT), the blacklist,
  and the locality walk with reserved semantics (off-switch delay
  bypassed, `canAssign:332-334`; no-space RE-RESERVES, :625-655).
  Otherwise available+killable vs minimum allocation (:1634-1648);
  multi-node mode checks partition used-capacity >= 1 with no
  killable resource (:1774-1797).
- Parent queue (`capacity/ParentQueue.java:548-599,610-619`):
  partition accessibility under RESPECT_PARTITION_EXCLUSIVITY
  (REJECTED), pending-request check (SKIPPED), then max-capacity
  (REJECTED) — the canAssign reserved/insufficient branches
  (:724-745) are subsumed by the single-node initial checks and a
  null node in multi-node mode, so they never decide a row here.
- Leaf queue (`capacity/LeafQueue.java:1142-1165`): accessibility
  then pending, as the parent; per-app (:1181-1243): queue
  max-capacity with the app's reservation (REJECTED, APP level),
  then the cached user limit (REJECTED QUEUE_HIT_USER_MAX_CAPACITY_
  LIMIT — the loop continues to the next app, so no queue echo).
- App gate (`RegularContainerAllocator.assignContainers:908-921`):
  no pending request for the partition at all → APPLICATION_DO_NOT_
  NEED_RESOURCE (SKIP_ASSIGNMENT → no queue echo).
- Request pre-checks (`preCheckForNodeCandidateSet:100-233`, in
  order): no off-switch pending ask / no outstanding asks
  (REQUEST_DO_NOT_NEED_RESOURCE), AM container under
  IGNORE_PARTITION_EXCLUSIVITY, node partition/placement mismatch
  (NODE level), reservation algo without continuous looking,
  headroom (:172-182 — headroom plus the app's unreservable resource
  when continuous looking; REJECTED, and the queue echoes
  QUEUE_DO_NOT_HAVE_ENOUGH_HEADROOM via SkippedType.QUEUE_LIMIT,
  LeafQueue:1266-1275), a vanished placement allocator
  (REQUEST_SKIPPED_BECAUSE_NULL_ANY_REQUEST), and the
  non-partitioned-partition-first opportunity count under IGNORE
  mode (:210-231).
- Node checks: blacklist (:237-249), then the locality walk
  (``assignContainersOnNode:489-585``): node-local, rack-local
  (relax-locality gate → PRIORITY_SKIPPED; delay gate `missed >
  min(N, node_delay)`, :351-356), off-switch (relax gate; delay gate
  — reserved container bypasses, unique-ask==1 short-circuits,
  rack-additional-delay mode `missed > min(N, node+rack_delay)`,
  else the locality-wait-factor formula `min(N, outstanding *
  min((uniq-1)/N, 1)) < missed`, :324-343); a walk with no ask at
  all records NODE_SKIPPED_BECAUSE_OF_NO_OFF_SWITCH_AND_LOCALITY_
  VIOLATION (:577-583 — reachable only on the reserved path, since
  the pre-check already requires an off-switch ask for new
  allocations). canAssign(NODE_LOCAL) additionally requires an
  outstanding rack ask (:345-348,358-364).
- assignContainer (:516-663): capability vs node TOTAL resource
  (LOCALITY_SKIPPED — falls to the next locality type), available
  (+killable when preemption is allowed, :561-579) containers; with
  space, continuous looking may require unreserving — failure is
  NODE_CAN_NOT_FIND_CONTAINER_TO_BE_UNRESERVED_WHEN_NEEDED
  (:590-614); without space, shouldAllocOrReserve / an existing
  reservation RESERVES (RE_RESERVED when re-reserving) unless
  continuous looking needed an unreserve (:628-641); else
  NODE_DO_NOT_HAVE_SUFFICIENT_RESOURCE skips the locality type.
- Post-allocation races (`doAllocation:744-799`): a container that
  cannot be created records APPLICATION_COULD_NOT_GET_CONTAINER and
  a concurrent allocate failure APPLICATION_FAIL_TO_ALLOCATE (both
  APP level, REJECTED, APP_SKIPPED → no echo; new containers only).
- Outcome → queue echo (`AbstractContainerAllocator.
  getCSAssignmentFromAllocateResult:71-165` + LeafQueue:1256-1289):
  allocations/reservations → leaf ACCEPTED (EMPTY ≡ null diagnostic,
  `ActivityDiagnosticConstant.java:28`); QUEUE_SKIPPED → leaf
  REJECTED with the headroom diagnostic; APP_SKIPPED →
  SkippedType.OTHER, the app loop continues and the leaf records
  nothing; every other empty assignment → leaf SKIPPED
  QUEUE_SKIPPED_TO_RESPECT_FIFO and the iteration stops.

The reference appends one record per visited rule; this operator
reports the DECISIVE record per attempt row (the terminal rule) —
the surface an operator actually queries — with diagnostics as
constant names rather than prose.

Spark-first: one whole-stage-codegen when-chain over the attempt
rows — zero shuffles, zero UDFs; every input column that summarizes
deeper scheduler state points at the operator that models it
(headroom/user limits: operators/userlimit + operators/capacity;
queue mappings: operators/csmapping; placement constraints:
operators/constraints; locality delays: operators/localitydelay;
blacklist: operators/amblacklist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUEUE = "QUEUE"
APP = "APP"
REQUEST = "REQUEST"
NODE = "NODE"

ACCEPTED = "ACCEPTED"
REJECTED = "REJECTED"
SKIPPED = "SKIPPED"
ALLOCATED = "ALLOCATED"
RESERVED = "RESERVED"
RE_RESERVED = "RE_RESERVED"

HEADROOM = "QUEUE_DO_NOT_HAVE_ENOUGH_HEADROOM"
FIFO = "QUEUE_SKIPPED_TO_RESPECT_FIFO"


def _lit(x):
    if isinstance(x, (str, type(None))):
        return F.lit(x).cast("string")
    return x


def _t(level, queue, state, diag, alloc_type=None, echo_state=None,
       echo_diag=None):
    return F.struct(
        _lit(level).alias("level"),
        queue.alias("queue"),
        _lit(state).alias("state"),
        _lit(diag).alias("diagnostic"),
        _lit(alloc_type).alias("alloc_type"),
        _lit(echo_state).alias("echo_state"),
        _lit(echo_diag).alias("echo_diag"),
    )


def allocation_activities(attempts: DataFrame) -> DataFrame:
    """Decisive activity record per allocation attempt row.

    Expected columns (module docstring cites the reference source of
    each): attempt_id long, node_id string, app_id string,
    parent_path string, leaf_path string; multi_node bool,
    ignore_exclusivity bool; node_removed bool, node_reserved bool
    (single-node: the FULFILL path — the attempt allocates the
    node's reserved container), node_avail long, node_killable long,
    node_total long, min_alloc long, part_used_cap double,
    part_killable long; parent_accessible bool, parent_pending long,
    parent_over_max bool, leaf_accessible bool, leaf_pending long,
    leaf_over_max bool, user_assignable bool, app_has_pending bool;
    any_ask long, outstanding long, waiting_am bool, partition_match
    bool, continue_looking bool, should_alloc_or_reserve bool,
    headroom long, app_reserved long, null_any_request bool,
    missed_nonpart long, cluster_nodes long; blacklisted bool,
    node_ask long, rack_ask long, can_delay_rack bool, can_delay_any
    bool, sched_opps long, node_delay long, rack_extra_delay long,
    uniq_asks long; capability long, preemption_allowed bool,
    need_unreserve bool, found_unreserve bool, container_create_fail
    bool, alloc_race_fail bool.

    Returns (attempt_id, node_id, app_id, level, queue, state,
    diagnostic, alloc_type, echo_state, echo_diag)."""
    c = F.col
    respect = ~c("ignore_exclusivity")
    root = F.lit("root")
    null_s = F.lit(None).cast("string")
    fifo_echo = (F.lit(SKIPPED), F.lit(FIFO))
    no_echo = (null_s, null_s)

    def node_skip(diag, echo):
        return _t(NODE, c("leaf_path"), SKIPPED, diag, None,
                  echo[0], echo[1])

    def walk(is_res: bool):
        """Locality walk + assignContainer outcome; ``is_res`` is the
        reserved-container (fulfill) path."""
        has_space = (c("node_avail") >= c("capability")) | (
            c("preemption_allowed")
            & (c("node_avail") + c("node_killable") >= c("capability"))
        )
        # continuous-looking unreserve gates apply to NEW containers
        unres_gate = (
            F.lit(not is_res)
            & c("continue_looking")
            & (~c("should_alloc_or_reserve") | c("need_unreserve"))
        )
        can_reserve = c("should_alloc_or_reserve") | F.lit(is_res)
        reserve_denied = (
            F.lit(not is_res) & c("continue_looking") & c("need_unreserve")
        )
        outcome_kind = (
            F.when(c("capability") > c("node_total"), "SKIP_TOTAL")
            .when(has_space & unres_gate & ~c("found_unreserve"),
                  "SKIP_UNRES")
            .when(has_space, "ALLOC")
            .when(can_reserve & reserve_denied, "SKIP_SPACE")
            .when(can_reserve,
                  "RE_RESERVE" if is_res else "RESERVE")
            .otherwise("SKIP_SPACE")
        )
        skip_diag = (
            F.when(outcome_kind == "SKIP_TOTAL",
                   "NODE_TOTAL_RESOURCE_INSUFFICIENT_FOR_REQUEST")
            .when(
                outcome_kind == "SKIP_UNRES",
                "NODE_CAN_NOT_FIND_CONTAINER_TO_BE_UNRESERVED_WHEN_NEEDED",
            )
            .otherwise("NODE_DO_NOT_HAVE_SUFFICIENT_RESOURCE")
        )
        terminal = outcome_kind.isin("ALLOC", "RESERVE", "RE_RESERVE")
        req_type = (
            F.when(c("node_ask") > 0, "NODE_LOCAL")
            .when(c("rack_ask") > 0, "RACK_LOCAL")
            .otherwise("OFF_SWITCH")
        )
        outcome_state = (
            F.when(outcome_kind == "ALLOC", ALLOCATED)
            .when(outcome_kind == "RESERVE", RESERVED)
            .otherwise(RE_RESERVED)
        )
        outcome_diag = F.when(
            outcome_kind.isin("RESERVE", "RE_RESERVE"),
            F.lit("NODE_DO_NOT_HAVE_SUFFICIENT_RESOURCE"),
        )
        win = _t(NODE, c("leaf_path"), outcome_state, outcome_diag,
                 req_type, F.lit(ACCEPTED), null_s)
        if not is_res:
            # doAllocation races (:744-799), new containers only
            win = (
                F.when(
                    outcome_kind.isin("ALLOC", "RESERVE")
                    & c("container_create_fail"),
                    _t(APP, c("leaf_path"), REJECTED,
                       "APPLICATION_COULD_NOT_GET_CONTAINER"),
                )
                .when(
                    (outcome_kind == "ALLOC") & c("alloc_race_fail"),
                    _t(APP, c("leaf_path"), REJECTED,
                       "APPLICATION_FAIL_TO_ALLOCATE"),
                )
                .otherwise(win)
            )

        can_nl = c("rack_ask") > 0
        can_rack = c("sched_opps") > F.least(
            c("cluster_nodes"), c("node_delay")
        )
        wait_factor = F.least(
            F.greatest(c("uniq_asks") - 1, F.lit(0)).cast("double")
            / c("cluster_nodes"),
            F.lit(1.0),
        )
        can_off = (
            F.when(F.lit(is_res), True)
            .when(c("cluster_nodes") == 0, False)
            .when(c("uniq_asks") == 1, True)
            .when(
                c("rack_extra_delay") > -1,
                c("sched_opps")
                > F.least(c("cluster_nodes"),
                          c("node_delay") + c("rack_extra_delay")),
            )
            .otherwise(
                F.least(c("cluster_nodes").cast("double"),
                        c("outstanding") * wait_factor)
                < c("sched_opps")
            )
        )
        nl_hit = (c("node_ask") > 0) & can_nl & terminal
        rack_relax = (c("rack_ask") > 0) & ~c("can_delay_rack")
        rack_hit = ((c("rack_ask") > 0) & c("can_delay_rack")
                    & can_rack & terminal)
        any_relax = (c("any_ask") > 0) & ~c("can_delay_any")
        return (
            F.when(nl_hit | rack_hit, win)
            .when(rack_relax, node_skip(
                "NODE_SKIPPED_BECAUSE_OF_RELAX_LOCALITY", fifo_echo))
            .when(any_relax, node_skip(
                "NODE_SKIPPED_BECAUSE_OF_RELAX_LOCALITY", fifo_echo))
            .when((c("any_ask") > 0) & ~can_off, node_skip(
                "NODE_SKIPPED_BECAUSE_OF_OFF_SWITCH_DELAY", no_echo))
            .when(
                c("any_ask") > 0,
                F.when(terminal, win).otherwise(
                    node_skip(skip_diag, no_echo)),
            )
            .otherwise(node_skip(
                "NODE_SKIPPED_BECAUSE_OF_NO_OFF_SWITCH_AND_LOCALITY"
                "_VIOLATION",
                fifo_echo,
            ))
        )

    # reserved-container fulfill path (pre-checks bypassed)
    fulfill = (
        F.when(
            c("outstanding") <= 0,
            # release (:866-873): records nothing; QUEUE_SKIPPED makes
            # the leaf echo the headroom diagnostic
            _t(REQUEST, c("leaf_path"), SKIPPED, None, None,
               F.lit(REJECTED), F.lit(HEADROOM)),
        )
        .when(c("blacklisted"),
              node_skip("NODE_IS_BLACKLISTED", no_echo))
        .otherwise(walk(is_res=True))
    )

    headroom_ok = (
        c("headroom")
        + F.when(c("continue_looking"), c("app_reserved")).otherwise(0)
        >= c("capability")
    )

    verdict = (
        # initial checks
        F.when(
            c("multi_node")
            & (c("part_used_cap") >= 1.0)
            & (c("part_killable") == 0),
            _t(QUEUE, root, REJECTED,
               "INIT_CHECK_PARTITION_RESOURCE_INSUFFICIENT"),
        )
        .when(
            ~c("multi_node") & c("node_removed"),
            _t(QUEUE, root, REJECTED, "INIT_CHECK_SINGLE_NODE_REMOVED"),
        )
        .when(~c("multi_node") & c("node_reserved"), fulfill)
        .when(
            ~c("multi_node")
            & (c("node_avail") + c("node_killable") < c("min_alloc")),
            _t(QUEUE, root, REJECTED,
               "INIT_CHECK_SINGLE_NODE_RESOURCE_INSUFFICIENT"),
        )
        # parent queue
        .when(
            respect & ~c("parent_accessible"),
            _t(QUEUE, c("parent_path"), REJECTED,
               "QUEUE_NOT_ABLE_TO_ACCESS_PARTITION"),
        )
        .when(
            c("parent_pending") <= 0,
            _t(QUEUE, c("parent_path"), SKIPPED,
               "QUEUE_DO_NOT_NEED_MORE_RESOURCE"),
        )
        .when(
            c("parent_over_max"),
            _t(QUEUE, c("parent_path"), REJECTED,
               "QUEUE_HIT_MAX_CAPACITY_LIMIT"),
        )
        # leaf queue
        .when(
            respect & ~c("leaf_accessible"),
            _t(QUEUE, c("leaf_path"), REJECTED,
               "QUEUE_NOT_ABLE_TO_ACCESS_PARTITION"),
        )
        .when(
            c("leaf_pending") <= 0,
            _t(QUEUE, c("leaf_path"), SKIPPED,
               "QUEUE_DO_NOT_NEED_MORE_RESOURCE"),
        )
        # app gates
        .when(
            c("leaf_over_max"),
            _t(APP, c("leaf_path"), REJECTED,
               "QUEUE_HIT_MAX_CAPACITY_LIMIT", None,
               REJECTED, "QUEUE_HIT_MAX_CAPACITY_LIMIT"),
        )
        .when(
            ~c("user_assignable"),
            _t(APP, c("leaf_path"), REJECTED,
               "QUEUE_HIT_USER_MAX_CAPACITY_LIMIT"),
        )
        .when(
            ~c("app_has_pending"),
            _t(APP, c("leaf_path"), SKIPPED,
               "APPLICATION_DO_NOT_NEED_RESOURCE"),
        )
        # request pre-checks
        .when(
            (c("any_ask") <= 0) | (c("outstanding") <= 0),
            _t(REQUEST, c("leaf_path"), SKIPPED,
               "REQUEST_DO_NOT_NEED_RESOURCE", None, *fifo_echo),
        )
        .when(
            c("ignore_exclusivity") & c("waiting_am"),
            _t(REQUEST, c("leaf_path"), SKIPPED,
               "REQUEST_SKIPPED_IN_IGNORE_EXCLUSIVITY_MODE"),
        )
        .when(
            ~c("partition_match"),
            _t(NODE, c("leaf_path"), SKIPPED,
               "NODE_DO_NOT_MATCH_PARTITION_OR_PLACEMENT_CONSTRAINTS",
               None, *fifo_echo),
        )
        .when(
            ~c("continue_looking") & ~c("should_alloc_or_reserve"),
            _t(REQUEST, c("leaf_path"), SKIPPED,
               "REQUEST_SKIPPED_BECAUSE_OF_RESERVATION", None,
               *fifo_echo),
        )
        .when(
            ~headroom_ok,
            _t(REQUEST, c("leaf_path"), REJECTED, HEADROOM, None,
               REJECTED, HEADROOM),
        )
        .when(
            c("null_any_request"),
            _t(REQUEST, c("leaf_path"), SKIPPED,
               "REQUEST_SKIPPED_BECAUSE_NULL_ANY_REQUEST", None,
               *fifo_echo),
        )
        .when(
            c("ignore_exclusivity")
            & (c("missed_nonpart") < c("cluster_nodes")),
            _t(REQUEST, c("leaf_path"), SKIPPED,
               "REQUEST_SKIPPED_BECAUSE_NON_PARTITIONED_PARTITION"
               "_FIRST"),
        )
        # node gates + locality walk
        .when(c("blacklisted"),
              node_skip("NODE_IS_BLACKLISTED", no_echo))
        .otherwise(walk(is_res=False))
    )

    return attempts.select(
        "attempt_id", "node_id", "app_id",
        verdict["level"].alias("level"),
        verdict["queue"].alias("queue"),
        verdict["state"].alias("state"),
        verdict["diagnostic"].alias("diagnostic"),
        verdict["alloc_type"].alias("alloc_type"),
        verdict["echo_state"].alias("echo_state"),
        verdict["echo_diag"].alias("echo_diag"),
    )
