"""Property-style operator semantics tests (the reference's contract-test
style: AbstractFSContractTestBase bonded per implementation)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hadoop_source_spark.operators import asof, kv, relational, setops


@pytest.fixture(scope="module")
def kv_fixture(spark):
    """Seeded KV table with duplicate-free int keys + probe set straddling
    the key range (FIXTURES.md 'kv' contract cases)."""
    rng = random.Random(42)
    keys = sorted(rng.sample(range(0, 10_000), 500))
    rows = [(k, f"val{k}") for k in keys]
    probes = sorted(rng.sample(range(-100, 10_200), 300))
    kv_df = spark.createDataFrame(rows, "key long, value string")
    probe_df = spark.createDataFrame([(p,) for p in probes], "key long")
    return keys, probes, kv_df, probe_df


def _model_closest(keys, probe, before):
    """Python reference model of MapFile.Reader.getClosest."""
    if before:
        cands = [k for k in keys if k <= probe]
        return max(cands) if cands else None
    cands = [k for k in keys if k >= probe]
    return min(cands) if cands else None


@pytest.mark.parametrize("before", [False, True])
def test_get_closest_matches_model(spark, kv_fixture, before):
    keys, probes, kv_df, probe_df = kv_fixture
    got = {
        r.key: r.key_right
        for r in kv.kv_get_closest(kv_df, probe_df, before=before).collect()
    }
    for p in probes:
        assert got[p] == _model_closest(keys, p, before), (p, before)


def test_get_closest_exact_match_wins(spark, kv_fixture):
    keys, _, kv_df, _ = kv_fixture
    some = spark.createDataFrame([(keys[7],)], "key long")
    for before in (False, True):
        r = kv.kv_get_closest(kv_df, some, before=before).collect()[0]
        assert r.key_right == keys[7]
        assert r.value == f"val{keys[7]}"


def test_asof_join_by_groups(spark):
    """Backward asof with by-keys: each left row gets the latest right row
    at-or-before it within its group only."""
    left = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 15), ("c", 5)], "g string, t long"
    )
    right = spark.createDataFrame(
        [("a", 5, "r1"), ("a", 20, "r2"), ("b", 30, "r3")],
        "g string, t long, payload string",
    )
    out = {
        (r.g, r.t): (r.t_right, r.payload)
        for r in asof.asof_join(left, right, on="t", by="g", how="left").collect()
    }
    assert out[("a", 10)] == (5, "r1")
    assert out[("a", 20)] == (20, "r2")  # inclusive
    assert out[("b", 15)] == (None, None)  # right exists but only later
    assert out[("c", 5)] == (None, None)  # no right group


def test_asof_inner_drops_unmatched(spark):
    left = spark.createDataFrame([("a", 1), ("a", 9)], "g string, t long")
    right = spark.createDataFrame([("a", 5, "x")], "g string, t long, p string")
    rows = asof.asof_join(left, right, on="t", by="g", how="inner").collect()
    assert [(r.g, r.t, r.p) for r in rows] == [("a", 9, "x")]


def test_asof_null_on_value_gets_no_match(spark):
    """Null ordering key on the probe side: sorts before every build row
    (nulls-first), so backward asof yields no match — documented."""
    left = spark.createDataFrame([("a", None), ("a", 10)], "g string, t long")
    right = spark.createDataFrame([("a", 5, "x")], "g string, t long, p string")
    out = {
        r.t: r.p
        for r in asof.asof_join(left, right, on="t", by="g", how="left").collect()
    }
    assert out[10] == "x"
    assert out[None] is None


def test_asof_null_probe_key_forward_gets_no_match(spark):
    """Null probe key in direction='forward': nulls-first ordering means
    nothing precedes it in the frame, so it must NOT pair with the minimum
    build key (the round-1 leak)."""
    left = spark.createDataFrame([("a", None), ("a", 4)], "g string, t long")
    right = spark.createDataFrame([("a", 5, "x")], "g string, t long, p string")
    out = {
        r.t: (r.t_right, r.p)
        for r in asof.asof_join(
            left, right, on="t", by="g", direction="forward", how="left"
        ).collect()
    }
    assert out[4] == (5, "x")
    assert out[None] == (None, None)


def test_asof_null_build_key_dropped_both_directions(spark):
    """A build row with null ordering key is never 'the closest entry':
    its payload must not be carried into probe rows (round-1 leak: payload
    arrived via last(..., ignorenulls=True) while t_right stayed null)."""
    left = spark.createDataFrame([("a", 10)], "g string, t long")
    right = spark.createDataFrame(
        [("a", None, "ghost")], "g string, t long, p string"
    )
    for direction in ("backward", "forward"):
        rows = asof.asof_join(
            left, right, on="t", by="g", direction=direction, how="left"
        ).collect()
        assert len(rows) == 1
        assert rows[0].t_right is None and rows[0].p is None, direction
        inner = asof.asof_join(
            left, right, on="t", by="g", direction=direction, how="inner"
        ).collect()
        assert inner == [], direction


def test_asof_duplicate_build_ts_resolution(spark):
    """Two build rows at the same (by, on): the kernel keeps exactly one
    match per probe row (no row multiplication — unlike a range join)."""
    left = spark.createDataFrame([("a", 10)], "g string, t long")
    right = spark.createDataFrame(
        [("a", 5, "x"), ("a", 5, "y")], "g string, t long, p string"
    )
    rows = asof.asof_join(left, right, on="t", by="g", how="left").collect()
    assert len(rows) == 1 and rows[0].p in ("x", "y")


def test_dedup_clusters_known_components(spark):
    from hadoop_source_spark.llmops import dedup as dd

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "id_a long, id_b long",
    )
    got = {r.node: r.cluster for r in dd.dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_dedup_clusters_long_chain_converges_fast(spark):
    """Pointer halving: a 120-link chain must converge within the default
    20 rounds (plain min-propagation would need ~120) — the O(log D)
    guarantee that makes CC safe for pathological chains at scale."""
    from hadoop_source_spark.llmops import dedup as dd

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "id_a long, id_b long"
    )
    got = {r.node: r.cluster for r in dd.dedup_clusters(chain).collect()}
    assert got == {i: 0 for i in range(121)}


def test_snapshot_diff_classification(spark):
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    v2 = spark.createDataFrame(
        [(2, "B"), (3, "c"), (4, "d")], "id long, v string"
    )
    got = {r.id: r.change for r in setops.snapshot_diff(v1, v2, ["id"]).collect()}
    assert got == {1: "-", 2: "M", 4: "+"}  # 3 unchanged → absent


def test_snapshot_diff_rename_detection(spark):
    """With an identity (inode-id analog), delete+create at the same
    identity collapses to 'R' with dst path."""
    v1 = spark.createDataFrame(
        [("/a", 100, "x"), ("/b", 101, "y"), ("/c", 102, "z")],
        "path string, inode long, v string",
    )
    v2 = spark.createDataFrame(
        [("/a2", 100, "x"), ("/b", 101, "Y"), ("/d", 103, "w")],
        "path string, inode long, v string",
    )
    rows = {
        (r.path, r.change): r
        for r in setops.snapshot_diff(
            v1, v2, ["path"], identity="inode"
        ).collect()
    }
    assert ("/a", "R") in rows and rows[("/a", "R")].dst_path == "/a2"
    assert ("/b", "M") in rows
    assert ("/c", "-") in rows
    assert ("/d", "+") in rows
    assert len(rows) == 4


def test_bucketed_join_has_no_exchange(spark):
    """Same-key bucketed tables join with zero shuffles."""
    from hadoop_source_spark import io as hio
    from hadoop_source_spark import plans
    from hadoop_source_spark.data import table

    l = table(spark, "/root/testdata/sf0.001", "lineitem")
    o = table(spark, "/root/testdata/sf0.001", "orders")
    hio.write_bucketed(l, "bkt_lineitem", "l_orderkey", 8)
    hio.write_bucketed(o, "bkt_orders", "o_orderkey", 8)
    bl = spark.table("bkt_lineitem")
    bo = spark.table("bkt_orders")
    # force the non-broadcast path: at test SF AQE would broadcast and
    # hide the bucketing effect we're demonstrating
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            bl.join(bo, bl.l_orderkey == bo.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        assert plans.join_counts(j)["sort_merge"] == 1
        assert j.count() > 0
        n_exchanges = plans.shuffle_count(j)
        assert n_exchanges <= 1, f"expected only the agg exchange, got {n_exchanges}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_merge_sorted_is_globally_sorted(spark):
    rng = random.Random(7)
    vals = [rng.randrange(100_000) for _ in range(3000)]
    dfs = [
        spark.createDataFrame([(v,) for v in vals[i::3]], "k long")
        for i in range(3)
    ]
    merged = relational.merge_sorted(dfs, ["k"])
    collected = [r.k for r in merged.toLocalIterator()]
    assert collected == sorted(vals)


def test_top_k_uses_take_ordered(spark):
    df = spark.createDataFrame([(i,) for i in range(10_000)], "x long")
    plan = (
        relational.top_k(df, 5, [F.col("x").desc()])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_with_position_is_dense(spark):
    df = spark.createDataFrame([("c",), ("a",), ("b",)], "k string")
    rows = kv.with_position(df, ["k"]).collect()
    assert [(r.pos, r.k) for r in sorted(rows, key=lambda r: r.pos)] == [
        (0, "a"), (1, "b"), (2, "c"),
    ]


def test_global_ntile_matches_window_ntile(spark):
    """relational.global_ntile must reproduce F.ntile(k) over a global
    order exactly — without the single-partition window sort."""
    from pyspark.sql import Window

    from hadoop_source_spark.operators import relational as rel

    # n=1003, k=4 → uneven buckets (3 buckets of 251, 1 of 250)
    df = spark.range(1003).select(
        (F.col("id") * 7919 % 1003).alias("v"), "id"
    )
    want = {
        (r.id, r.nt)
        for r in df.select(
            "id", F.ntile(4).over(Window.orderBy("v", "id")).alias("nt")
        ).collect()
    }
    got = {
        (r.id, r.bucket)
        for r in rel.global_ntile(df, ["v", "id"], 4).collect()
    }
    assert got == want

    # k > n edge: every row its own bucket, in order
    small = spark.range(3).select(F.col("id").alias("v"), "id")
    got_small = {
        (r.v, r.bucket) for r in rel.global_ntile(small, ["v"], 8).collect()
    }
    assert got_small == {(0, 1), (1, 2), (2, 3)}


def test_resample_gapfill_locf_and_interp(spark):
    """Hand-built hourly series with interior and trailing gaps: LOCF
    carries the last value, interpolation is exactly linear, leading
    rows are observed by construction (spine spans observed min..max)."""
    from datetime import datetime

    from hadoop_source_spark.operators import timeseries as tsr

    rows = [
        # series "a": hours 0,1,4,5 observed -> gaps at 2,3 (interior)
        ("a", datetime(2024, 1, 1, 0), 10.0),
        ("a", datetime(2024, 1, 1, 1), 20.0),
        ("a", datetime(2024, 1, 1, 4), 50.0),
        ("a", datetime(2024, 1, 1, 5), 60.0),
        # series "b": hours 0,2 observed, two points same bucket
        ("b", datetime(2024, 1, 1, 0), 1.0),
        ("b", datetime(2024, 1, 1, 0, 30), 3.0),
        ("b", datetime(2024, 1, 1, 2), 7.0),
    ]
    df = spark.createDataFrame(rows, ["series", "ts", "value"])
    out = tsr.resample_gapfill(df, "ts", "series", "value")
    got = {
        (r.series, r.bkt.hour): (r.n_events, r.value_locf, r.value_interp, r.is_gap)
        for r in out.collect()
    }
    assert len(got) == 6 + 3
    # interior gap of "a": linear 20 -> 50 over hours 1..4
    assert got[("a", 2)] == (0, 20.0, 30.0, 1)
    assert got[("a", 3)] == (0, 20.0, 40.0, 1)
    assert got[("a", 4)] == (1, 50.0, 50.0, 0)
    # "b": bucket 0 averages two events; gap at 1 interpolates 2 -> 7
    assert got[("b", 0)] == (2, 2.0, 2.0, 0)
    assert got[("b", 1)] == (0, 2.0, 4.5, 1)
    assert got[("b", 2)] == (1, 7.0, 7.0, 0)


def test_pivot_unpivot_round_trip(spark):
    """unpivot(pivot(long)) recovers the original long aggregates —
    the melt direction of the pivot operator."""
    long = spark.createDataFrame(
        [(1, "a", 2.0), (1, "a", 3.0), (1, "b", 4.0), (2, "b", 5.0)],
        ["k", "t", "v"],
    )
    wide = long.groupBy("k").pivot("t", ["a", "b"]).agg(F.sum("v"))
    back = {
        (r.k, r.t, r.v)
        for r in wide.unpivot("k", ["a", "b"], "t", "v")
        .filter(F.col("v").isNotNull())
        .collect()
    }
    want = {
        (r.k, r.t, r.v)
        for r in long.groupBy("k", "t").agg(F.sum("v").alias("v")).collect()
    }
    assert back == want


def test_distcp_sync_plan_flags(spark):
    """COPY/UPDATE/SKIP/DELETE classification, and the -update/-delete
    flag semantics from the reference CLI."""
    from hadoop_source_spark.operators import distcp

    src = spark.createDataFrame(
        [("new", 10), ("stale", 20), ("same", 30)], ["path", "bytes"]
    )
    dst = spark.createDataFrame(
        [("stale", 15), ("same", 30), ("gone", 40)], ["path", "bytes"]
    )
    plan = {
        r.path: r.op for r in distcp.sync_plan(src, dst).collect()
    }
    assert plan == {
        "new": "COPY", "stale": "UPDATE", "same": "SKIP", "gone": "DELETE"
    }
    blind = {
        r.path: r.op
        for r in distcp.sync_plan(src, dst, update=False, delete=False).collect()
    }
    # without -update every source file re-copies; without -delete the
    # target-only file is left alone
    assert blind == {
        "new": "COPY", "stale": "COPY", "same": "COPY", "gone": "SKIP"
    }


def test_balancer_moves_restore_balance(spark):
    """Conservation + convergence: total moved bytes == total excess,
    and applying the plan puts every node exactly at the floored average
    (over-nodes shed to avg, under-nodes fill to avg)."""
    from collections import defaultdict

    from hadoop_source_spark.operators import balancer

    rows = [("n%d" % (i % 5), 100 * (i % 5) + 10) for i in range(200)]
    df = spark.createDataFrame(rows, ["node", "bytes"])
    util = {r.node: r.used for r in balancer.utilization(df, "node", "bytes").collect()}
    avg = sum(util.values()) // len(util)
    moves = balancer.move_plan(df, "node", "bytes", threshold=0.1).collect()
    assert moves, "skewed fixture must need moves"
    excess = sum(u - avg for u in util.values() if u > avg * 1.1)
    assert sum(m.move_bytes for m in moves) == excess
    delta = defaultdict(int)
    for m in moves:
        delta[m.src] -= m.move_bytes
        delta[m.dst] += m.move_bytes
    for node, used in util.items():
        after = used + delta[node]
        if used > avg * 1.1:
            assert after == avg, (node, used, after, avg)
        elif used < avg * 0.9:
            assert after <= avg, (node, used, after, avg)


def test_block_placement_policy_invariants(spark):
    """plan_replicas upholds BlockPlacementPolicyDefault's contract on
    every block: 3 replicas on 3 distinct nodes, replica 1 on the
    writer, replica 2 on a different rack than 1, replica 3 on replica
    2's rack but another node, never more than 2 replicas per rack —
    and the plan actually SPREADS (no single node hoards replica 2)."""
    from pyspark.sql import functions as F

    from hadoop_source_spark.operators import placement

    blocks = spark.range(300).select(
        F.col("id").alias("block_id"),
        F.concat(F.lit("n"), (F.col("id") % 11).cast("string")).alias("writer"),
    )
    topo = spark.range(11).select(
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("node"),
        F.col("id").alias("node_id"),
        F.concat(F.lit("r"), (F.col("id") % 3).cast("string")).alias("rack"),
    )
    plan = placement.plan_replicas(blocks, topo).collect()
    by_block = {}
    for r in plan:
        by_block.setdefault(r.block_id, {})[r.replica_idx] = (r.node, r.rack)
    assert len(by_block) == 300
    second_nodes = set()
    for bid, reps in by_block.items():
        assert set(reps) == {1, 2, 3}, bid
        nodes = [reps[i][0] for i in (1, 2, 3)]
        racks = [reps[i][1] for i in (1, 2, 3)]
        assert len(set(nodes)) == 3, bid
        assert racks[1] != racks[0], bid
        assert racks[2] == racks[1], bid
        assert max(racks.count(x) for x in racks) <= 2, bid
        assert reps[1][0] == f"n{bid % 11}", bid
        second_nodes.add(nodes[1])
    assert len(second_nodes) >= 5, second_nodes


def test_distcp_incremental_all_op_classes(spark):
    """The -diff incremental plan exercises every op class on the
    planted scenario, and RENAME rows carry a destination path while
    copying no data (dst differs only by the planted prefix)."""
    from hadoop_source_spark import workload

    rows = workload.QUERIES["distcp_incremental_plan"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ops = {}
    for r in rows:
        ops.setdefault(r.op, []).append(r)
    assert set(ops) == {"COPY", "DELETE", "UPDATE", "RENAME"}, set(ops)
    for r in ops["RENAME"]:
        assert r.dst_path == r.path.replace("/w1/p", "/w1/moved/p")
    assert all(r.dst_path is None for op in ("COPY", "DELETE", "UPDATE")
               for r in ops[op])


def test_storage_policy_longest_prefix_semantics(spark):
    """resolve_policies: deepest ancestor wins, component boundaries are
    respected (/a/src1 never governs /a/src10), unmatched files fall
    back to the default, and mover_plan only moves mismatched replicas."""
    from pyspark.sql import functions as F

    from hadoop_source_spark.operators import mover

    files = spark.createDataFrame(
        [
            ("/a/src1/en/doc1",),
            ("/a/src1/de/doc2",),
            ("/a/src10/en/doc3",),
            ("/b/doc4",),
        ],
        "path string",
    )
    policies = spark.createDataFrame(
        [("/a", "COLD"), ("/a/src1", "WARM"), ("/a/src1/en", "ALL_SSD")],
        "prefix string, policy string",
    )
    got = {
        r.path: r.policy
        for r in mover.resolve_policies(files, policies).collect()
    }
    assert got == {
        "/a/src1/en/doc1": "ALL_SSD",   # deepest override
        "/a/src1/de/doc2": "WARM",      # parent override
        "/a/src10/en/doc3": "COLD",     # src1 must NOT match src10
        "/b/doc4": "HOT",               # default
    }
    replicas = spark.createDataFrame(
        [("/a/src1/en/doc1", 1, "SSD"), ("/a/src1/en/doc1", 2, "DISK"),
         ("/b/doc4", 1, "DISK"), ("/b/doc4", 4, "ARCHIVE")],
        "path string, replica_idx int, tier string",
    )
    plan = {
        (r.path, r.replica_idx): (r.from_tier, r.to_tier)
        for r in mover.mover_plan(replicas, policies).collect()
    }
    # replica already on the right tier is not moved
    assert ("/a/src1/en/doc1", 1) not in plan
    assert plan[("/a/src1/en/doc1", 2)] == ("DISK", "SSD")
    assert ("/b/doc4", 1) not in plan  # HOT slot 1 = DISK
    # replica beyond slot 3 takes the last template slot (HOT -> DISK)
    assert plan[("/b/doc4", 4)] == ("ARCHIVE", "DISK")


def test_capacity_allocation_invariants(spark):
    """capacity.allocate: never over-allocates the cluster, never
    exceeds a queue's elastic maximum, serves guaranteed shares FIFO
    (no later app gets guaranteed capacity while an earlier app in the
    same queue is still short of it), and every allocation is within
    [0, demand]."""
    from pyspark.sql import functions as F

    from hadoop_source_spark.operators import capacity

    apps = spark.createDataFrame(
        [(i, f"q{i % 3}", 50 + (i * 37) % 200) for i in range(60)],
        "app_id long, queue string, demand long",
    )
    queues = spark.createDataFrame(
        [("q0", 0.4, 0.6), ("q1", 0.2, 0.5), ("q2", 0.1, 0.15)],
        "queue string, cap_pct double, max_pct double",
    )
    total = 3000
    rows = sorted(
        capacity.allocate(apps, queues, total).collect(),
        key=lambda r: (r.queue, r.app_id),
    )
    assert sum(r.total_alloc for r in rows) <= total
    caps = {"q0": int(total * 0.6), "q1": int(total * 0.5), "q2": int(total * 0.15)}
    guar = {"q0": int(total * 0.4), "q1": int(total * 0.2), "q2": int(total * 0.1)}
    by_q = {}
    for r in rows:
        assert 0 <= r.alloc_guaranteed and 0 <= r.alloc_elastic
        assert r.total_alloc <= r.demand
        by_q.setdefault(r.queue, []).append(r)
    for q, rs in by_q.items():
        assert sum(r.total_alloc for r in rs) <= caps[q], q
        assert sum(r.alloc_guaranteed for r in rs) <= guar[q], q
        # FIFO: once an app is left short of guaranteed, no later app
        # in the queue receives any guaranteed allocation
        short_seen = False
        for r in rs:
            if short_seen:
                assert r.alloc_guaranteed == 0, (q, r.app_id)
            if r.alloc_guaranteed < r.demand:
                short_seen = True


def test_ordered_funnel_strict_ordering_and_rates(spark):
    """Planted funnel: users who act out of order or stop mid-funnel
    must not count in later steps; rates are relative to step 1."""
    from datetime import datetime

    from hadoop_source_spark.operators.funnel import ordered_funnel

    def t(m):
        return datetime(2024, 1, 1, 0, m)

    rows = [
        # u1: full ordered chain
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
        # u2: clicks BEFORE viewing — click must not count
        (2, t(1), "click"), (2, t(2), "view"),
        # u3: view+click only
        (3, t(0), "view"), (3, t(5), "click"),
        # u4: purchase first, then view — only step 1
        (4, t(0), "purchase"), (4, t(1), "view"),
        # u5: never views — appears nowhere
        (5, t(0), "click"), (5, t(1), "purchase"),
    ]
    e = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.step: (r.n_users, r.conv_rate)
           for r in ordered_funnel(e, ["view", "click", "purchase"]).collect()}
    assert got == {
        "view": (4, 1.0),
        "view>click": (2, 0.5),
        "view>click>purchase": (1, 0.25),
    }


def test_node_label_allocation_partition_independence(spark):
    """allocate_labeled: label partitions are independent schedulers
    (RMNodeLabelsManager.getResourceByLabel) — a saturated gpu
    partition must not eat into the default partition's leftover, and
    each partition's result equals a standalone allocate() run."""
    from hadoop_source_spark.operators import capacity

    apps = spark.createDataFrame(
        [(1, "q0", "", 100), (2, "q0", "", 900),
         (3, "q0", "gpu", 500), (4, "q1", "gpu", 500)],
        "app_id long, queue string, label string, demand long",
    )
    queues = spark.createDataFrame(
        [("q0", "", 0.5, 1.0), ("q0", "gpu", 0.5, 0.5),
         ("q1", "gpu", 0.5, 0.5)],
        "queue string, label string, cap_pct double, max_pct double",
    )
    totals = spark.createDataFrame(
        [("", 1000), ("gpu", 400)], "label string, cluster_total long"
    )
    out = {r.app_id: r for r in
           capacity.allocate_labeled(apps, queues, totals).collect()}
    # default partition: q0 may grow to max 1.0 — both apps fully served
    assert out[1].state == "FULLY" and out[2].state == "FULLY"
    assert out[1].total_alloc + out[2].total_alloc == 1000
    # gpu partition: 400 total, each queue capped at 200 — both PARTIAL,
    # untouched by the default partition's demand
    assert out[3].total_alloc == 200 and out[3].state == "PARTIAL"
    assert out[4].total_alloc == 200 and out[4].state == "PARTIAL"
    # equivalence: each label slice == standalone allocate() on it
    solo = {r.app_id: r for r in capacity.allocate(
        apps.filter(F.col("label") == "").drop("label"),
        queues.filter(F.col("label") == "").drop("label"),
        cluster_total=1000).collect()}
    for i in (1, 2):
        assert solo[i].total_alloc == out[i].total_alloc


def test_node_label_oversubscribed_partition_rejected(spark):
    import pytest

    from hadoop_source_spark.operators import capacity

    apps = spark.createDataFrame(
        [(1, "q0", "gpu", 10)],
        "app_id long, queue string, label string, demand long",
    )
    queues = spark.createDataFrame(
        [("q0", "gpu", 0.7, 0.8), ("q1", "gpu", 0.6, 0.8),
         ("q0", "", 0.5, 0.5)],
        "queue string, label string, cap_pct double, max_pct double",
    )
    totals = spark.createDataFrame(
        [("gpu", 100), ("", 100)], "label string, cluster_total long"
    )
    with pytest.raises(ValueError, match="gpu"):
        capacity.allocate_labeled(apps, queues, totals)


def test_label_partition_resources_no_label_and_down_nodes(spark):
    from hadoop_source_spark.operators import capacity

    nodes = spark.createDataFrame(
        [("n0", None, 100, True), ("n1", "", 50, True),
         ("n2", "gpu", 200, True), ("n3", "gpu", 200, False)],
        "node string, label string, resource long, running boolean",
    )
    out = {r.label: r.cluster_total for r in
           capacity.label_partition_resources(nodes).collect()}
    # null and '' merge into the NO_LABEL partition; down nodes excluded
    assert out == {"": 150, "gpu": 200}


def test_oiv_file_distribution_bucket_rules(spark):
    """FileDistributionCalculator.java:137-141: bucket = ceil(size/step)
    — an exact multiple stays in its own segment ((i-1)·step, i·step] —
    size 0 lands in bucket 0, oversize files clamp to the LAST segment
    (even when step does not divide maxSize), zero buckets are skipped."""
    from hadoop_source_spark import catalog

    rows = [
        ("FILE", 0, 1, 0),     # bucket 0
        ("FILE", 1, 1, 1),     # bucket 1
        ("FILE", 100, 2, 1),   # exactly step → bucket 1
        ("FILE", 101, 1, 2),   # bucket 2
        ("FILE", 250, 3, 3),   # maxSize=250, step=100 → ceil=3 (clamp 2)
        ("FILE", 9999, 1, 10),  # oversize → last bucket
        ("DIRECTORY", None, None, None),
        ("DIRECTORY", None, None, None),
    ]
    inodes = spark.createDataFrame(
        rows,
        "inode_type string, size long, replication long, blocks long",
    )
    out = catalog.file_distribution(inodes, max_size=250, step=100)
    got = {(r.stat, r.size): r.value for r in out.collect()}
    # last index = 250//100 = 2 → label 200; 250, 9999 both clamp there
    assert got[("bucket", 0)] == 1
    assert got[("bucket", 100)] == 2
    assert got[("bucket", 200)] == 3
    assert ("bucket", 300) not in got
    assert got[("totalFiles", None)] == 6
    assert got[("totalDirectories", None)] == 2
    assert got[("totalBlocks", None)] == 17
    assert got[("totalSpace", None)] == 0 + 1 + 200 + 101 + 750 + 9999
    assert got[("maxFileSize", None)] == 9999


def test_pipeline_recovery_satisfy_boundaries(spark):
    """ReplaceDatanodeOnFailure.satisfy (:128): no replacement when the
    pipeline is empty or still full; DEFAULT needs r>=3 AND (n <= r/2
    integer-division OR append OR hflushed); bestEffort decides whether
    a failed replacement kills the write."""
    from hadoop_source_spark.operators import writepath

    rows = [
        # id, policy, best_effort, r, n, append, hflushed, repl_ok
        (1, "DEFAULT", False, 3, 1, False, False, True),   # 1<=1 → replace
        (2, "DEFAULT", False, 4, 2, False, False, True),   # 2<=2 → replace
        (3, "DEFAULT", False, 4, 3, False, False, True),   # 3>2 → continue short
        (4, "DEFAULT", False, 4, 3, False, True, True),    # hflushed → replace
        (5, "DEFAULT", False, 2, 1, True, True, True),     # r<3 → never
        (6, "ALWAYS", False, 2, 1, False, False, False),   # fails, no BE
        (7, "ALWAYS", True, 2, 1, False, False, False),    # fails, BE
        (8, "NEVER", True, 3, 1, True, True, True),        # policy off
        (9, "ALWAYS", True, 3, 0, False, False, True),     # nothing left
        (10, "ALWAYS", True, 3, 3, False, False, True),    # pipeline full
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, policy string, best_effort boolean, "
        "replication int, n_remaining int, is_append boolean, "
        "is_hflushed boolean, replacement_ok boolean",
    )
    out = {r.event_id: r for r in
           writepath.pipeline_recovery_plan(df).collect()}
    assert out[1].needs_replacement and out[1].action == "REPLACED_CONTINUE"
    assert out[2].needs_replacement
    assert not out[3].needs_replacement
    assert out[3].action == "CONTINUE_DEGRADED"
    assert out[4].needs_replacement
    assert not out[5].needs_replacement
    assert out[6].action == "WRITE_FAILED"
    assert out[7].action == "CONTINUE_DEGRADED"
    assert not out[8].needs_replacement
    assert out[9].action == "ABORT_NO_DATANODES"
    assert not out[10].needs_replacement and out[10].action == "CONTINUE"


def test_asof_build_tiebreak_matches_preaggregate(spark):
    """build_tiebreak (r14): duplicate build keys resolved to the MIN
    tiebreak value must equal the classic pre-aggregate formulation —
    the exchange it removes is pure key-dedup."""
    left = spark.createDataFrame(
        [("u", 10, 100), ("u", 5, 101), ("v", 7, 102)],
        "g string, t long, pid long",
    )
    # duplicate (g, t) build keys: ids 3/1 at u@5 (min 1 wins), 9/8 at u@10
    right = spark.createDataFrame(
        [("u", 5, 3), ("u", 5, 1), ("u", 10, 9), ("u", 10, 8), ("v", 1, 7)],
        "g string, t long, bid long",
    )
    fused = asof.asof_join(
        left, right, on="t", by="g", direction="backward", how="inner",
        build_tiebreak="bid",
    ).select("g", "t", "pid", "bid", "t_right")
    pre = right.groupBy("g", "t").agg(F.min("bid").alias("bid"))
    classic = asof.asof_join(
        left, pre, on="t", by="g", direction="backward", how="inner"
    ).select("g", "t", "pid", "bid", "t_right")
    assert sorted(map(tuple, fused.collect())) == sorted(
        map(tuple, classic.collect())
    )
    got = {r.pid: r.bid for r in fused.collect()}
    assert got == {100: 8, 101: 1, 102: 7}

    # forward direction honours the same min-wins rule
    fwd = asof.asof_join(
        left, right, on="t", by="g", direction="forward", how="inner",
        build_tiebreak="bid",
    )
    assert {r.pid: r.bid for r in fwd.collect()} == {100: 8, 101: 1}

    with pytest.raises(ValueError, match="nearest"):
        asof.asof_join(
            left, right, on="t", by="g", direction="nearest",
            build_tiebreak="bid",
        )


def test_extract_meta_passthrough_columns(spark):
    """extract_meta passthrough (r14): carried columns come back
    unchanged next to the kernel's own metadata, enabling single-scan
    fusion of downstream projections (doc_profile)."""
    from hadoop_source_spark.llmops import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "bonjour", "fr")],
        "doc_id long, text string, lang string",
    )
    src = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"),
        "text", "lang",
    )
    out = {r.doc_id: r for r in
           mm.extract_meta(src, passthrough=("text", "lang")).collect()}
    import hashlib

    assert out[1].text == "hello world" and out[1].lang == "en"
    assert out[1].n_bytes == 11
    assert out[1].md5 == hashlib.md5(b"hello world").hexdigest()
    assert out[2].lang == "fr" and out[2].n_bytes == 7
    # no passthrough → the classic 5-column contract is unchanged
    legacy = mm.extract_meta(mm.with_payload(docs)).columns
    assert legacy == ["doc_id", "n_bytes", "md5", "fake_width", "fake_height"]
