"""FairScheduler starvation pins (FSAppAttempt.fairShareStarvation:
1158-1181, FSLeafQueue.updateStarvedApps*:214-298,
minShareStarvation:583-604)."""

from __future__ import annotations

from hadoop_source_spark.operators import fairstarve

A_SCHEMA = (
    "queue string, app_id long, app_rank int, fair_share long,"
    " demand long, usage long, last_at_fair long"
)
Q_SCHEMA = (
    "queue string, min_share long, q_demand long, q_usage long,"
    " last_at_min long, fs_timeout long, ms_timeout long,"
    " fs_threshold double"
)
NOW = 10_000


def _run(spark, apps, queues):
    out = fairstarve.starvation_report(
        spark.createDataFrame(apps, A_SCHEMA),
        spark.createDataFrame(queues, Q_SCHEMA),
        now_ms=NOW,
    ).collect()
    return {r["app_id"]: r for r in out}


def test_fairshare_starvation_and_break(spark):
    got = _run(
        spark,
        [
            ("q1", 1, 0, 200, 500, 50, 0),    # below 0.5*200: starved 50
            ("q1", 2, 1, 200, 500, 150, 0),   # above threshold: zero, BREAK
            ("q1", 3, 2, 400, 500, 10, 0),    # after break: never computed
        ],
        [("q1", 0, 1500, 210, 0, 1000, 1000, 0.5)],
    )
    assert got[1]["fairshare_starvation"] == 50 and got[1]["fs_listed"]
    assert got[2]["fairshare_starvation"] == 0 and not got[2]["fs_listed"]
    # the walk broke before app 3: stored starvation stays none
    assert got[3]["fairshare_starvation"] == 0 and not got[3]["fs_listed"]
    assert got[1]["in_starved_list"]
    assert not got[3]["in_starved_list"]


def test_minshare_distribution_with_overshoot(spark):
    got = _run(
        spark,
        [
            ("q2", 1, 0, 10, 40, 10, 0),    # ams 30 <= pending 80
            ("q2", 2, 1, 10, 100, 10, 0),   # ams 90 > pending 50: overshoot
            ("q2", 3, 2, 10, 30, 10, 0),    # pending exhausted: reset
        ],
        [("q2", 100, 300, 20, 0, 1000, 1000, 0.5)],
    )
    assert got[1]["minshare_starvation"] == 30
    # the reference assigns the OVERSHOOT (appMinShare - pending)
    assert got[2]["minshare_starvation"] == 40
    assert got[3]["minshare_starvation"] == 0
    assert got[1]["in_starved_list"] and got[2]["in_starved_list"]
    assert not got[3]["in_starved_list"]


def test_timeouts_gate_both_paths(spark):
    got = _run(
        spark,
        [("q3", 1, 0, 200, 500, 50, 9_500)],
        [("q3", 100, 500, 50, 9_500, 1000, 1000, 0.5)],
    )
    assert got[1]["fairshare_starvation"] == 0
    assert got[1]["minshare_starvation"] == 0
    assert not got[1]["in_starved_list"]


def test_fairshare_subsumes_minshare(spark):
    # queue minshare starvation 90 minus fairshare sum 50 leaves 40;
    # the app's own ams = pending demand (450) - its fs (50) = 400 > 40
    got = _run(
        spark,
        [("q4", 1, 0, 200, 500, 50, 0)],
        [("q4", 140, 500, 50, 0, 1000, 1000, 0.5)],
    )
    assert got[1]["fairshare_starvation"] == 50
    assert got[1]["minshare_starvation"] == 400 - 40
    assert got[1]["in_starved_list"]


def test_no_demand_apps_do_not_consume(spark):
    got = _run(
        spark,
        [
            ("q5", 1, 0, 10, 50, 50, 0),   # zero pending demand
            ("q5", 2, 1, 10, 60, 10, 0),
        ],
        [("q5", 100, 110, 60, 0, 1000, 1000, 0.5)],
    )
    assert not got[1]["in_starved_list"]
    assert got[1]["minshare_starvation"] == 0
    # q_ms = min(100,110)-60 = 40; app2 ams = 50 > 40 -> overshoot 10
    assert got[2]["minshare_starvation"] == 10


def test_randomized_cross_check_vs_sequential_walks(spark):
    """The two prefix-sum closed forms vs literal re-implementations
    of updateStarvedAppsFairshare (break-at-first-zero) and
    updateStarvedAppsMinshare (decrementing pending w/ overshoot)."""
    import math
    import random

    rng = random.Random(20260815)
    apps, queues, expected = [], [], {}
    for qn in range(30):
        queue = f"q{qn}"
        n = rng.randint(1, 8)
        rows = []
        for rank in range(n):
            fair_share = rng.choice([128, 256, 512, 1024])
            demand = rng.randint(0, 2000)
            usage = rng.randint(0, demand) if demand else 0
            last = rng.choice([0, 9_500])
            rows.append((rank, fair_share, demand, usage, last))
        q_demand = sum(r[2] for r in rows)
        q_usage = sum(r[3] for r in rows)
        min_share = rng.randint(0, max(q_usage + 1000, 1))
        last_min = rng.choice([0, 9_990])
        thr = rng.choice([0.5, 0.75, 1.0])
        queues.append((queue, min_share, q_demand, q_usage, last_min,
                       1000, 1000, thr))
        # sequential fairshare walk (break at first zero)
        fs = {}
        listed = set()
        fs_sum = 0
        broke = False
        for rank, share, demand, usage, last in rows:
            if demand - usage <= 0:
                continue
            if broke:
                fs[rank] = 0
                continue
            fd = min(int(math.floor(share * thr)), demand)
            starv = (
                max(fd - usage, 0)
                if usage < fd and 10_000 - last >= 1000
                else 0
            )
            fs[rank] = starv
            if starv == 0:
                broke = True
            else:
                listed.add(rank)
                fs_sum += starv
        # queue minshare + distribution walk
        q_ms = (
            max(min(min_share, q_demand) - q_usage, 0)
            if 10_000 - last_min >= 1000
            else 0
        )
        pending = max(q_ms - fs_sum, 0)
        ms = {}
        in_list = set(listed)
        for rank, share, demand, usage, last in rows:
            pd = max(demand - usage, 0)
            if pd <= 0:
                continue
            if pending > 0:
                ams = max(pd - fs.get(rank, 0), 0)
                if ams > pending:
                    ms[rank] = ams - pending
                    pending = 0
                else:
                    pending -= ams
                    ms[rank] = ams
                in_list.add(rank)
            else:
                ms[rank] = 0
        for rank, share, demand, usage, last in rows:
            apps.append((queue, qn * 100 + rank, rank, share, demand,
                         usage, last))
            expected[(queue, qn * 100 + rank)] = (
                fs.get(rank, 0), ms.get(rank, 0), rank in in_list
            )
    got = fairstarve.starvation_report(
        spark.createDataFrame(apps, A_SCHEMA),
        spark.createDataFrame(queues, Q_SCHEMA),
        now_ms=NOW,
    ).collect()
    assert len(got) == len(apps)
    for r in got:
        key = (r["queue"], r["app_id"])
        want = expected[key]
        assert (
            r["fairshare_starvation"],
            r["minshare_starvation"],
            r["in_starved_list"],
        ) == want, key
