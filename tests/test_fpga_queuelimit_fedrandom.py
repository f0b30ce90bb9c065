"""FPGA allocator, QueueLimitCalculator, and randomized federation
router semantics, pinned per the reference tests
(TestFpgaResourceHandlerImpl, TestNodeQueueLoadMonitor,
TestWeightedRandomRouterPolicy/TestLocalityRouterPolicy)."""

from __future__ import annotations

from hadoop_source_spark.operators import fpga, oppcontainers, yarnfed


def _devices(spark, rows):
    return spark.createDataFrame(
        rows,
        "node_id string, fpga_type string, minor int, aocx_hash string,"
        " used_by string",
    )


def _requests(spark, rows):
    return spark.createDataFrame(
        rows,
        "node_id string, container_id string, fpga_type string,"
        " requested long, ipid_hash string",
    )


def test_fpga_ip_match_first_then_list_order(spark):
    devs = _devices(spark, [
        ("n0", "IntelOpenCL", 0, "aaa", None),
        ("n0", "IntelOpenCL", 1, "bbb", None),
        ("n0", "IntelOpenCL", 2, "bbb", None),
        ("n0", "IntelOpenCL", 3, None, None),
    ])
    out = fpga.assign_fpgas(
        _requests(spark, [("n0", "c1", "IntelOpenCL", 2, "BBB")]), devs
    ).collect()
    minors = sorted(r["minor"] for r in out)
    # both IP-matched devices (1,2) taken, none else: count satisfied
    assert minors == [1, 2]
    assert all(r["ip_matched"] for r in out)
    assert out[0]["n_assigned"] == 2 and out[0]["n_denied"] == 2


def test_fpga_all_matches_grabbed_even_past_count(spark):
    # assignFpga:199-210 — every hash match is taken, remaining<0 loop
    # never runs: a 1-device ask with 2 matches gets BOTH
    devs = _devices(spark, [
        ("n0", "IntelOpenCL", 0, "xyz", None),
        ("n0", "IntelOpenCL", 1, "xyz", None),
        ("n0", "IntelOpenCL", 2, None, None),
    ])
    out = fpga.assign_fpgas(
        _requests(spark, [("n0", "c1", "IntelOpenCL", 1, "xyz")]), devs
    ).collect()
    assert sorted(r["minor"] for r in out) == [0, 1]
    assert out[0]["n_assigned"] == 2


def test_fpga_fill_from_list_head_when_no_match(spark):
    devs = _devices(spark, [
        ("n0", "IntelOpenCL", 0, "aaa", None),
        ("n0", "IntelOpenCL", 1, None, None),
        ("n0", "IntelOpenCL", 2, None, "someoneelse"),
        ("n0", "IntelOpenCL", 3, None, None),
    ])
    out = fpga.assign_fpgas(
        _requests(spark, [("n0", "c1", "IntelOpenCL", 2, "nomatch")]), devs
    ).collect()
    # head of the free list in (index,minor) order: 0 then 1 (2 is held)
    assert sorted(r["minor"] for r in out) == [0, 1]
    assert not any(r["ip_matched"] for r in out)


def test_fpga_verdicts(spark):
    devs = _devices(spark, [
        ("n0", "IntelOpenCL", 0, None, None),
        ("n0", "IntelOpenCL", 1, None, "held"),
    ])
    out = {r["container_id"]: r.asDict() for r in fpga.assign_fpgas(
        _requests(spark, [
            ("n0", "c1", "NoSuchType", 1, None),   # FAIL_NO_TYPE
            ("n0", "c2", "IntelOpenCL", -1, None),  # FAIL_COUNT
            ("n0", "c3", "IntelOpenCL", 2, None),   # > available(1)
            ("n0", "c4", "IntelOpenCL", 0, None),   # ALLOW_NONE
        ]), devs).collect()}
    assert out["c1"]["verdict"] == "FAIL_NO_TYPE"
    assert out["c2"]["verdict"] == "FAIL_COUNT"
    assert out["c3"]["verdict"] == "FAIL_COUNT"
    assert out["c4"]["verdict"] == "ALLOW_NONE"
    # zero-count denies every allowed device on the node (:236-237)
    assert out["c4"]["n_denied"] == 2


def test_fpga_recovery(spark):
    devs = _devices(spark, [
        ("n0", "IntelOpenCL", 0, None, None),
        ("n0", "IntelOpenCL", 1, None, "other"),
    ])
    maps = spark.createDataFrame(
        [
            ("n0", "c1", "IntelOpenCL", 0),
            ("n0", "c1", "IntelOpenCL", 1),   # held by other
            ("n0", "c1", "IntelOpenCL", 9),   # unknown device
            ("n0", "other", "IntelOpenCL", 1),  # own holding is fine
        ],
        "node_id string, container_id string, fpga_type string, minor int",
    )
    got = {(r["container_id"], r["minor"]): r["verdict"]
           for r in fpga.recover_fpgas(maps, devs).collect()}
    assert got[("c1", 0)] == "OK"
    assert got[("c1", 1)] == "ALREADY_ASSIGNED"
    assert got[("c1", 9)] == "NOT_ALLOWED"
    assert got[("other", 1)] == "OK"


def test_queue_limit_math(spark):
    # QueueLimitCalculator.Stats.update: int mean, rounded stdev,
    # threshold mean + sigma*stdev clamped
    hbs = spark.createDataFrame(
        [
            ("n1", 1, 2, 10, 10, False),
            ("n2", 1, 3, -1, 10, False),   # wait -1: out of WAIT set
            ("n3", 1, 7, 30, 10, False),
            ("n4", 1, 4, 20, 10, True),    # decommissioning: out of both
        ],
        "node_id string, ts long, queue_len long, wait_time long,"
        " queue_cap long, decommissioning boolean",
    )
    out = {r["comparator"]: r.asDict() for r in oppcontainers.queue_limit(
        hbs, sigma=1.0, range_min=1, range_max=100).collect()}
    ql = out["QUEUE_LENGTH"]
    # values 2,3,7: mean = 12/3 = 4, stdev = round(sqrt((4+1+9)/3))
    #             = round(2.16) = 2, threshold = 6
    assert (ql["n_nodes"], ql["mean"], ql["stdev"], ql["threshold"]) == (
        3, 4, 2, 6)
    assert ql["max_queue_length"] == 6 and ql["max_queue_wait_ms"] == -1
    wt = out["QUEUE_WAIT_TIME"]
    # values 10,30: mean 20, stdev round(sqrt(200/2)) = 10, threshold 30
    assert (wt["n_nodes"], wt["mean"], wt["stdev"], wt["threshold"]) == (
        2, 20, 10, 30)
    assert wt["max_queue_wait_ms"] == 30 and wt["max_queue_length"] == -1


def test_queue_limit_clamps(spark):
    hbs = spark.createDataFrame(
        [("n1", 1, 50, 1, 10, False), ("n2", 1, 90, 1, 10, False)],
        "node_id string, ts long, queue_len long, wait_time long,"
        " queue_cap long, decommissioning boolean",
    )
    out = {r["comparator"]: r.asDict() for r in oppcontainers.queue_limit(
        hbs, sigma=1.0, range_min=3, range_max=25).collect()}
    assert out["QUEUE_LENGTH"]["threshold"] == 25   # clamped high
    assert out["QUEUE_WAIT_TIME"]["threshold"] == 3  # clamped low (1,1)


def _fed(spark, apps_rows):
    apps = spark.createDataFrame(
        apps_rows, "app_id long, blacklist array<string>, node_sc string")
    subclusters = spark.createDataFrame(
        [("sc0", True), ("sc1", True), ("sc2", False), ("sc3", True)],
        "sc_id string, active boolean")
    weights = spark.createDataFrame(
        [("sc0", 1.0), ("sc1", 2.0), ("sc2", 4.0), ("sc3", 0.0)],
        "sc_id string, weight double")
    out = yarnfed.route_apps_random(apps, subclusters, weights, seed=7)
    return {r["app_id"]: r.asDict() for r in out.collect()}


def test_fed_random_weighted_walk(spark):
    got = _fed(spark, [(i, [], None) for i in range(50)])
    # weighted: only sc0 (w=1) and sc1 (w=2) eligible (sc2 inactive,
    # sc3 weight 0); picks follow the cumulative walk of u*3
    from hadoop_source_spark.llmops.sampling import _C, _P
    for i in range(50):
        u = ((i % _P + 7) * _C) % 10000 / 10000.0
        expect = "sc0" if u * 3.0 <= 1.0 else "sc1"
        assert got[i]["home_weighted"] == expect, i
    # uniform ignores weights: sc3 reachable
    assert {got[i]["home_uniform"] for i in range(50)} == {
        "sc0", "sc1", "sc3"}


def test_fed_random_locality_failforward(spark):
    got = _fed(spark, [
        (1, [], "sc1"),    # valid + enabled -> routed to the node's SC
        (2, [], "sc3"),    # weight 0: disabled -> fall forward
        (3, [], "sc2"),    # inactive -> fall forward
        (4, ["sc1"], "sc1"),  # blacklisted -> fall forward
        (5, [], None),     # unresolvable -> fall forward
    ])
    assert got[1]["home_locality"] == "sc1"
    for i in (2, 3, 4, 5):
        assert got[i]["home_locality"] == got[i]["home_weighted"], i
    # blacklist also constrains the weighted walk itself
    assert got[4]["home_weighted"] == "sc0"


def test_fed_random_no_positive_weights_is_null(spark):
    apps = spark.createDataFrame(
        [(1, ["sc0", "sc1"], None)],
        "app_id long, blacklist array<string>, node_sc string")
    subclusters = spark.createDataFrame(
        [("sc0", True), ("sc1", True), ("sc3", True)],
        "sc_id string, active boolean")
    weights = spark.createDataFrame(
        [("sc0", 1.0), ("sc1", 2.0), ("sc3", -1.0)],
        "sc_id string, weight double")
    out = yarnfed.route_apps_random(apps, subclusters, weights).collect()
    assert out[0]["home_weighted"] is None  # reference throws
    assert out[0]["home_uniform"] == "sc3"  # uniform ignores weights
