"""Placement-spec grammar parser, pinned per the reference's
TestPlacementConstraintParser.java cases (tree shapes, tokenizer
splits, failure specs) plus the bridge into placement_matrix's
normal form."""

from __future__ import annotations

import pytest

from hadoop_source_spark.operators.constraintparser import (
    MAX_CARD,
    Conj,
    NodeAttr,
    PlacementSpecParseError,
    SourceTags,
    Target,
    _split_outside_brackets,
    parse_expression,
    parse_placement_spec,
    parse_source_tags,
    to_requests_and_terms,
)


# --- target expressions (TestPlacementConstraintParser:64-132) ----------

def test_target_parser():
    assert parse_expression("NOTIN, NODE, foo") == Target(
        "node", 0, 0, (("self", "foo"),))
    assert parse_expression("notin, node, foo") == Target(
        "node", 0, 0, (("self", "foo"),))
    assert parse_expression("IN, NODE, foo") == Target(
        "node", 1, MAX_CARD, (("self", "foo"),))
    t = parse_expression("NOTIN, NODE, foo, bar, exp")
    assert t.scope == "node" and (t.min_card, t.max_card) == (0, 0)
    assert {tag for _, tag in t.targets} == {"foo", "bar", "exp"}
    # invalid op falls through every parser and fails
    with pytest.raises(PlacementSpecParseError):
        parse_expression("XYZ, NODE, foo")


def test_target_namespaces():
    t = parse_expression("notin, node, all/hbase")
    assert t.targets == (("all", "hbase"),)
    t = parse_expression("in, rack, not-self/zk")
    assert t.targets == (("not-self", "zk"),)
    # the keyword match is exact: id-carrying forms do not parse
    # (parseNameSpace:112-129)
    with pytest.raises(PlacementSpecParseError):
        parse_expression("in, node, app-id/app_1/zk")


# --- cardinality (:135-196) ---------------------------------------------

def test_cardinality_parser():
    assert parse_expression("cardinality, NODE, foo, 0, 1") == Target(
        "node", 0, 1, (("self", "foo"),))
    t = parse_expression("cardinality, RACK, a, b, c, 0, 1")
    assert t.scope == "rack" and (t.min_card, t.max_card) == (0, 1)
    assert {tag for _, tag in t.targets} == {"a", "b", "c"}
    with pytest.raises(PlacementSpecParseError):
        parse_expression("cardinality, NODE, foo")  # < 3 trailing
    with pytest.raises(PlacementSpecParseError):
        parse_expression("cardinality, NODE, foo, 0, bar")  # non-int max


# --- conjunctions (:199-271) --------------------------------------------

def test_conjunction_parser():
    c = parse_expression("AND(NOTIN,NODE,foo:NOTIN,NODE,bar)")
    assert c == Conj("AND", (
        Target("node", 0, 0, (("self", "foo"),)),
        Target("node", 0, 0, (("self", "bar"),)),
    ))
    c = parse_expression(
        "OR(IN,NODE,foo:AND(NOTIN,NODE,bar:NOTIN,NODE,moo))")
    assert c.op == "OR"
    assert isinstance(c.children[1], Conj) and c.children[1].op == "AND"


# --- tokenizers (:273-344) ----------------------------------------------

def test_multiple_constraints_tokenizer():
    assert _split_outside_brackets(
        "foo(1),A1,A2,A3:bar(2),B1,B2:moo(3),C1,C2", ":") == [
        "foo(1),A1,A2,A3", "bar(2),B1,B2", "moo(3),C1,C2"]
    assert _split_outside_brackets(
        "foo(1),AND(A2:A3):bar(2),OR(B1:AND(B2:B3)):moo(3),C1,C2",
        ":") == [
        "foo(1),AND(A2:A3)", "bar(2),OR(B1:AND(B2:B3))", "moo(3),C1,C2"]
    assert _split_outside_brackets("A:B:C", ":") == ["A", "B", "C"]
    assert _split_outside_brackets("A:AND(B:OR(C:D)):E", ":") == [
        "A", "AND(B:OR(C:D))", "E"]


def test_source_tags_tokenizer():
    assert parse_source_tags("A(4)") == SourceTags("A", 4)
    with pytest.raises(PlacementSpecParseError):
        parse_source_tags("A(B)")


# --- node attributes ------------------------------------------------------

def test_node_attr_parser():
    assert parse_expression("java=1.8") == NodeAttr("EQ", "java", ("1.8",))
    assert parse_expression("python!=3") == NodeAttr("NE", "python", ("3",))
    assert parse_expression("java=1.8,1.9") == NodeAttr(
        "EQ", "java", ("1.8", "1.9"))


# --- parsePlacementSpec (:347-460) ----------------------------------------

def test_parse_placement_spec():
    r = parse_placement_spec("foo(3)")
    assert r == [(SourceTags("foo", 3), None)]

    r = parse_placement_spec("foo(3),notin,node,foo")
    assert r == [(SourceTags("foo", 3),
                  Target("node", 0, 0, (("self", "foo"),)))]
    assert parse_placement_spec("foo(3),NOTIN,NODE,foo") == r

    r = parse_placement_spec("foo(10),cardinality,node,foo,bar,0,100")
    (st, c), = r
    assert st == SourceTags("foo", 10)
    assert (c.min_card, c.max_card) == (0, 100)
    assert {t for _, t in c.targets} == {"foo", "bar"}

    r = parse_placement_spec("foo(3),notin,node,foo:bar(2),in,node,foo")
    assert [st for st, _ in r] == [SourceTags("foo", 3),
                                   SourceTags("bar", 2)]

    r = parse_placement_spec(
        "foo(1000),and(notin,node,bar:or(in,node,foo:in,node,moo))"
        ":bar(200),notin,node,foo")
    assert len(r) == 2
    assert r[0][1].op == "AND" and r[0][1].children[1].op == "OR"

    # bare node-attribute constraint: empty source tags, single only
    r = parse_placement_spec("java=1.7,1.8")
    assert r[0][0].is_empty
    with pytest.raises(PlacementSpecParseError):
        parse_placement_spec("java=1.7:foo(3),notin,node,foo")

    for bad in ("foo(3", "foo),bar", "foobar", "),java=1.7,1.8"):
        with pytest.raises(PlacementSpecParseError):
            parse_placement_spec(bad)


# --- bridge ----------------------------------------------------------------

def _bridge(spec, app="a1", req=0):
    (st, c), = parse_placement_spec(spec)
    return to_requests_and_terms([(req, app, st, c)])


def test_bridge_shapes():
    reqs, terms = _bridge("zk(3),in,node,hbase")
    assert reqs[0]["combinator"] == "AND"
    assert reqs[0]["source_tag"] == "zk"
    assert reqs[0]["num_allocations"] == 3
    assert terms[0]["min_card"] == 1 and terms[0]["max_card"] == MAX_CARD
    assert terms[0]["target_values"] == ["hbase"]

    # AND of singles folds into ONE group (group = AND of terms)
    reqs, terms = _bridge("w(1),and(in,node,a:notin,node,b)")
    assert reqs[0]["combinator"] == "AND"
    assert {t["group_id"] for t in terms} == {0}
    assert len(terms) == 2

    # OR of ANDs: one group per AND child
    reqs, terms = _bridge(
        "w(1),or(and(in,node,a:in,node,b):and(in,node,c:in,node,d))")
    assert reqs[0]["combinator"] == "OR"
    assert {t["group_id"] for t in terms} == {0, 1}

    # bare source tag: request with no terms
    reqs, terms = _bridge("idle(6)")
    assert terms == [] and reqs[0]["combinator"] == "AND"

    # namespace flows through
    _, terms = _bridge("a(1),notin,node,all/hbase")
    assert terms[0]["namespace"] == "all"

    # unsupported nesting / multi-value attrs raise loudly
    with pytest.raises(NotImplementedError):
        _bridge("w(1),and(in,node,a:or(in,node,b:in,node,c))")
    with pytest.raises(NotImplementedError):
        _bridge("java=1.7,1.8")
