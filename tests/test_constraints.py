"""Placement-constraint pins (PlacementConstraintsUtil:74-116
cardinality gates, :118-132 partition, :149-214 key-only attribute
matching; AllocationTagsManager.getCardinality:176-199 min/max tag
reduction; TargetApplicationsNamespace self/not-self/all/app-id/
app-tag scopes)."""

from __future__ import annotations

from hadoop_source_spark.operators import constraints

MAX = constraints.MAX_CARD

NODES = [("n1", "r1", ""), ("n2", "r1", "gpu"), ("n3", "r2", "")]
NODES_SCHEMA = "node_id string, rack string, partition string"
ATTRS = [("n1", "java", "1.8"), ("n2", "java", "11")]  # n3 has no java
ATTRS_SCHEMA = "node_id string, attr_key string, attr_value string"
# app1: hbase x2 on n1, zk x1 on n3; app2: hbase x1 on n1
TAGS = [
    ("app1", "n1", "hbase", 2),
    ("app1", "n3", "zk", 1),
    ("app2", "n1", "hbase", 1),
]
TAGS_SCHEMA = "app_id string, node_id string, tag string, cnt long"
APP_TAGS = [("app1", "svc"), ("app2", "svc"), ("app2", "web")]
APP_TAGS_SCHEMA = "app_id string, app_tag string"

TERM_SCHEMA = (
    "req_id long, group_id int, term_id int, scope string,"
    " target_type string, namespace string, target_key string,"
    " target_values array<string>, min_card int, max_card int,"
    " attr_opcode string"
)
REQ_SCHEMA = "req_id long, app_id string, combinator string"
CAND_SCHEMA = "req_id long, node_id string"


def _run(spark, requests, candidates, terms):
    out = constraints.placement_matrix(
        spark.createDataFrame(candidates, CAND_SCHEMA),
        spark.createDataFrame(requests, REQ_SCHEMA),
        spark.createDataFrame(terms, TERM_SCHEMA),
        spark.createDataFrame(NODES, NODES_SCHEMA),
        spark.createDataFrame(ATTRS, ATTRS_SCHEMA),
        spark.createDataFrame(TAGS, TAGS_SCHEMA),
        spark.createDataFrame(APP_TAGS, APP_TAGS_SCHEMA),
    ).collect()
    return {(r["req_id"], r["node_id"]): r["satisfied"] for r in out}


def tag_term(req, values, min_c, max_c, ns="self", scope="node",
             group=0, term=0):
    return (req, group, term, scope, "allocation_tag", ns, None,
            values, min_c, max_c, None)


def test_no_terms_trivially_satisfied(spark):
    got = _run(spark, [(0, "app1", "AND")], [(0, "n1")], [])
    assert got[(0, "n1")] is True


def test_anti_affinity_and_affinity_self(spark):
    # (0,0) = anti-affinity: satisfied only where own tag is absent.
    reqs = [(0, "app1", "AND"), (1, "app1", "AND")]
    cands = [(0, "n1"), (0, "n2"), (1, "n1"), (1, "n2")]
    terms = [
        tag_term(0, ["hbase"], 0, 0),        # anti-affinity
        tag_term(1, ["hbase"], 1, MAX),      # affinity
    ]
    got = _run(spark, reqs, cands, terms)
    assert got[(0, "n1")] is False and got[(0, "n2")] is True
    assert got[(1, "n1")] is True and got[(1, "n2")] is False


def test_multi_tag_min_max_reduction(spark):
    # app1 on n1: hbase=2, zk=0. min over tags = 0 -> min_card=1 fails;
    # max over tags = 2 -> max_card=1 fails, max_card=2 passes.
    got = _run(spark, [(0, "app1", "AND"), (1, "app1", "AND"),
                       (2, "app1", "AND")],
               [(0, "n1"), (1, "n1"), (2, "n1")],
               [tag_term(0, ["hbase", "zk"], 1, MAX),
                tag_term(1, ["hbase", "zk"], 0, 1),
                tag_term(2, ["hbase", "zk"], 0, 2)])
    assert got[(0, "n1")] is False
    assert got[(1, "n1")] is False
    assert got[(2, "n1")] is True


def test_namespaces(spark):
    # hbase on n1: self(app1)=2, not-self=1, all=3, app-id/app2=1,
    # app-tag/svc=3.
    cases = [
        (0, "self", 2), (1, "not-self", 1), (2, "all", 3),
        (3, "app-id/app2", 1), (4, "app-tag/svc", 3),
    ]
    reqs = [(i, "app1", "AND") for i, _, _ in cases]
    cands = [(i, "n1") for i, _, _ in cases]
    terms = [tag_term(i, ["hbase"], c, c, ns=ns)
             for i, ns, c in cases]
    got = _run(spark, reqs, cands, terms)
    assert all(got[(i, "n1")] for i, _, _ in cases), got


def test_rack_scope_sums_nodes(spark):
    # rack r1 = n1+n2: hbase all = 3; rack r2: zk all = 1.
    got = _run(spark, [(0, "app1", "AND"), (1, "app1", "AND")],
               [(0, "n2"), (1, "n2")],
               [tag_term(0, ["hbase"], 3, 3, ns="all", scope="rack"),
                tag_term(1, ["zk"], 1, MAX, ns="all", scope="rack")])
    assert got[(0, "n2")] is True   # n2's rack holds 3 via n1
    assert got[(1, "n2")] is False  # zk only in rack r2


def test_node_partition_empty_means_no_label(spark):
    terms = [
        (0, 0, 0, "node", "node_partition", None, None, [], 0, MAX,
         None),
        (1, 0, 0, "node", "node_partition", None, None, ["gpu"], 0,
         MAX, None),
    ]
    got = _run(spark, [(0, "a", "AND"), (1, "a", "AND")],
               [(0, "n1"), (0, "n2"), (1, "n1"), (1, "n2")], terms)
    assert got[(0, "n1")] is True and got[(0, "n2")] is False
    assert got[(1, "n1")] is False and got[(1, "n2")] is True


def test_node_attribute_key_only_matching(spark):
    def attr(req, key, val, op):
        return (req, 0, 0, "node", "node_attribute", None, key, [val],
                0, MAX, op)
    got = _run(
        spark,
        [(i, "a", "AND") for i in range(4)],
        [(0, "n1"), (0, "n3"), (1, "n3"), (2, "n1"), (3, "n1")],
        [attr(0, "java", "1.8", "EQ"),   # n1 matches, n3 lacks key
         attr(1, "java", "1.8", "NE"),   # NE accepts the missing key
         attr(2, "java", "1.8", "NE"),   # present + equal -> reject
         attr(3, "java", "1.8", "NO_OP")],  # NO_OP never matches
    )
    assert got[(0, "n1")] is True and got[(0, "n3")] is False
    assert got[(1, "n3")] is True
    assert got[(2, "n1")] is False
    assert got[(3, "n1")] is False


def test_or_groups_and_and_groups(spark):
    terms_or = [
        tag_term(0, ["hbase"], 5, MAX, group=0),   # fails on n1 (2<5)
        tag_term(0, ["hbase"], 1, MAX, group=1),   # passes on n1
    ]
    got = _run(spark, [(0, "app1", "OR")], [(0, "n1")], terms_or)
    assert got[(0, "n1")] is True
    got = _run(spark, [(0, "app1", "AND")], [(0, "n1")], terms_or)
    assert got[(0, "n1")] is False
