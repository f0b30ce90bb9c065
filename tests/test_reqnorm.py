"""Resource-request normalization pins (SchedulerUtils.java:201
normalizeRequest / :265 normalizeAndValidateRequest / :332
validateResourceRequest; DominantResourceCalculator.normalize:447)."""

from __future__ import annotations

from hadoop_source_spark.operators import reqnorm

R_SCHEMA = (
    "req_id long, queue string, resource_name string, mem long,"
    " vcores long, label string"
)
Q_SCHEMA = "queue string, default_label string, accessible string"

QUEUES = [
    ("q1", None, "gpu,ssd"),
    ("q2", "gpu", "*"),
    ("q3", None, None),
]

CONF = dict(
    min_mem=512, max_mem=8192, inc_mem=512,
    min_vcores=1, max_vcores=16, inc_vcores=1,
    labels_enabled=True, cluster_labels=["gpu", "ssd"],
)


def _run(spark, rows, **over):
    conf = {**CONF, **over}
    out = reqnorm.normalize_requests(
        spark.createDataFrame(rows, R_SCHEMA),
        spark.createDataFrame(QUEUES, Q_SCHEMA),
        **conf,
    ).collect()
    return {r["req_id"]: r for r in out}


def test_verdict_taxonomy_and_order(spark):
    got = _run(
        spark,
        [
            (1, "q1", "*", 1000, 2, None),
            (2, "q1", "*", 9000, 2, None),
            (3, "q1", "*", -5, 2, None),
            (4, "q1", "*", 8192, 200, None),
            (5, "q1", "*", -5, -2, None),        # memory checked first
            (6, "q1", "host1", 100, 1, "gpu"),
            (7, "q1", "*", 100, 1, "gpu&&ssd"),
            (8, "q1", "*", 100, 1, "fpga"),
            (9, "q2", "*", 100, 1, "fpga"),      # '*' admits, not in cluster
            (10, "q2", "*", 100, 1, None),       # inherits queue default
            (11, "q3", "*", 100, 1, "gpu"),      # null accessible rejects
            (12, "q1", "host1", 100, 1, None),   # non-ANY null label -> ""
        ],
    )
    assert got[1]["verdict"] == "OK"
    assert got[2]["verdict"] == "GREATER_THAN_MAX_MEMORY"
    assert got[3]["verdict"] == "LESS_THAN_ZERO_MEMORY"
    assert got[4]["verdict"] == "GREATER_THAN_MAX_VCORES"
    assert got[5]["verdict"] == "LESS_THAN_ZERO_MEMORY"
    assert got[6]["verdict"] == "INVALID_LABEL_ON_NON_ANY"
    assert got[7]["verdict"] == "INVALID_MULTI_LABEL"
    assert got[8]["verdict"] == "INVALID_LABEL_NOT_ACCESSIBLE"
    assert got[9]["verdict"] == "INVALID_LABEL_NOT_IN_CLUSTER"
    assert got[10]["verdict"] == "OK"
    assert got[10]["effective_label"] == "gpu"
    assert got[11]["verdict"] == "INVALID_LABEL_NOT_ACCESSIBLE"
    assert got[12]["verdict"] == "OK"
    assert got[12]["effective_label"] == ""
    # rejected rows carry no normalized capability
    assert got[2]["norm_mem"] is None and got[2]["norm_vcores"] is None


def test_normalization_clamp_round_clamp(spark):
    got = _run(
        spark,
        [
            (1, "q1", "*", 1000, 2, None),   # round 1000 -> 1024
            (2, "q1", "*", 100, 0, None),    # clamp-low both dims
            (3, "q1", "*", 8192, 16, None),  # at max stays at max
        ],
    )
    assert (got[1]["norm_mem"], got[1]["norm_vcores"]) == (1024, 2)
    assert (got[2]["norm_mem"], got[2]["norm_vcores"]) == (512, 1)
    assert (got[3]["norm_mem"], got[3]["norm_vcores"]) == (8192, 16)


def test_round_up_past_max_clamps(spark):
    # validation sees the raw ask (3900 <= 4000 passes); the round-up
    # to 4096 then clamps to the non-multiple max
    got = _run(spark, [(1, "q1", "*", 3900, 1, None)], max_mem=4000)
    assert got[1]["verdict"] == "OK"
    assert got[1]["norm_mem"] == 4000


def test_zero_increment_skips_rounding(spark):
    got = _run(spark, [(1, "q1", "*", 1000, 2, None)], inc_mem=0)
    assert got[1]["norm_mem"] == 1000


def test_labels_disabled_rejects_any_expression_first(spark):
    got = _run(
        spark,
        [
            (1, "q1", "*", -5, 1, "gpu"),   # label check precedes mem
            (2, "q1", "*", 100, 1, None),
            (3, "q1", "*", 100, 1, ""),     # empty expression is fine
        ],
        labels_enabled=False,
    )
    assert got[1]["verdict"] == "INVALID_LABEL_DISABLED"
    assert got[1]["effective_label"] == "gpu"
    assert got[2]["verdict"] == "OK"
    assert got[3]["verdict"] == "OK"


def test_unknown_queue_skips_accessibility_checks(spark):
    # validateResourceRequest:360-374 guards the accessibility and
    # cluster checks on queueInfo != null — a dynamic queue's label
    # passes through to normalization instead of being rejected
    got = _run(spark, [
        (1, "qX", "*", 100, 1, "gpu"),    # unknown queue, cluster label
        (2, "qX", "*", 100, 1, "mars"),   # unknown queue, alien label
        (3, "q1", "*", 100, 1, "mars"),   # known queue still rejects
    ])
    assert got[1]["verdict"] == "OK"
    assert got[2]["verdict"] == "OK"
    assert got[3]["verdict"] == "INVALID_LABEL_NOT_ACCESSIBLE"


def test_unknown_queue_null_label_stays_null(spark):
    # normalizeNodeLabelExpressionInRequest guards BOTH the default
    # inheritance and the NO_LABEL ('') fallback on queueInfo != null
    # (SchedulerUtils:240,250-252): a dynamic queue's null label
    # passes through as NULL, while a known queue's becomes ''
    got = _run(spark, [
        (1, "qX", "*", 100, 1, None),      # dynamic, ANY: stays NULL
        (2, "qX", "host1", 100, 1, None),  # dynamic, non-ANY: stays NULL
        (3, "q1", "host1", 100, 1, None),  # known, non-ANY: NO_LABEL ''
        (4, "qX", "*", 100, 1, ""),        # explicit '' passes through
    ])
    assert got[1]["verdict"] == "OK"
    assert got[1]["effective_label"] is None
    assert got[2]["verdict"] == "OK"
    assert got[2]["effective_label"] is None
    assert got[3]["effective_label"] == ""
    assert got[4]["effective_label"] == ""
    # normalization still applies to the passthrough rows
    assert got[1]["norm_mem"] == 512 and got[1]["norm_vcores"] == 1
