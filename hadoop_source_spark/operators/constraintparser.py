"""YARN placement-spec grammar: `-placement_spec` strings -> the
constraint terms operators/constraints.placement_matrix evaluates.

The second of the reference's two query languages (beside the
TimelineReader filter grammar): distributed-shell and the service AM
accept placement constraints as strings like

    zk(3),in,node,hbase:web(2),and(in,node,zk:notin,rack,hbase)

Reference semantics (`hadoop-yarn-api/.../util/constraint/
PlacementConstraintParser.java`, trees pinned by
`TestPlacementConstraintParser.java`):

- `parsePlacementSpec:723-786` — specs split on ':' OUTSIDE brackets
  (`MultipleConstraintsTokenizer:311-377`'s bracket-aware scan); each
  spec is `sourceTag(numAllocations),CONSTRAINT` (split once on the
  literal "),"), a bare node-attribute constraint (empty source
  tags), or a bare `tag(n)` with a null constraint. An empty-source-
  tags entry is only legal when it is the whole spec (:761-775).
- `SourceTags.parseFrom:640-648` + `SourceTagsTokenizer:260-304` —
  exactly `tag(int)`, integer checked.
- `parseExpression:661-721` tries, in order: target, cardinality,
  conjunction, node-attribute; first success wins.
- `TargetConstraintParser:469-505` — `in|notin , node|rack , tag...`
  (ops and scope case-insensitive); IN builds cardinality [1, MAX],
  NOTIN [0, 0] (PlacementConstraints.targetIn:68-71 /
  targetNotIn:84-87). Tags may carry a namespace prefix `ns/tag`
  where ns must be an exact AllocationTagNamespaceType keyword —
  self, not-self, all, app-id, app-tag (`parseNameSpace:112-129`;
  note the id-carrying forms app-id/<id>/<tag> do NOT parse, the
  keyword match is exact — a reference limitation kept here).
- `CardinalityConstraintParser:512-562` — `cardinality, scope,
  tag..., min, max`; max popped last, then min, the rest are tags;
  fewer than 3 trailing elements is an error.
- `NodeConstraintParser:384-467` — comma-separated `k=v` / `k!=v`
  (split on the CHARACTERS '!' and '='); later bare tokens append
  to the value set (java=1.8,1.9); no k=v at all is an error; the
  op comes from literal "!=" containment.
- `ConjunctionConstraintParser:569-604` + `ConjunctionTokenizer:
  199-243` — AND(...)/OR(...) (all-lower or all-upper only, the
  reference's startsWith check), children split bracket-aware and
  parsed recursively by parseExpression.

The bridge to the evaluator (`to_requests_and_terms`) flattens the
parsed tree into placement_matrix's two-level normal form (request
combinator over groups of ANDed terms) — single constraints, AND of
singles, OR of singles, OR of ANDs; deeper nesting raises, matching
the evaluator's documented contract. Parsing is driver-side over
config-sized strings; evaluation stays in the broadcast-join plan of
operators/constraints.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

MAX_CARD = 2147483647

_NAMESPACES = ("self", "not-self", "all", "app-id", "app-tag")


class PlacementSpecParseError(ValueError):
    """Mirrors PlacementConstraintParseException."""


@dataclass(frozen=True)
class Target:
    """SingleConstraint over allocation tags: cardinality window
    [min_card, max_card] of `targets` ((namespace, tag) pairs) within
    `scope`."""
    scope: str  # 'node' | 'rack'
    min_card: int
    max_card: int
    targets: tuple  # ((namespace, tag), ...)


@dataclass(frozen=True)
class NodeAttr:
    opcode: str  # 'EQ' | 'NE'
    key: str
    values: tuple  # sorted


@dataclass(frozen=True)
class Conj:
    op: str  # 'AND' | 'OR'
    children: tuple


@dataclass(frozen=True)
class SourceTags:
    tag: str
    num: int

    @property
    def is_empty(self) -> bool:
        return self.tag == "" and self.num == 0


def _split_outside_brackets(expr: str, delim: str) -> list[str]:
    """MultipleConstraintsTokenizer: split on `delim` at bracket
    depth 0; empty segments dropped (the reference skips them)."""
    out, buf, depth = [], [], 0
    for ch in expr:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        if ch == delim and depth == 0:
            if buf:
                out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return out


def parse_source_tags(expr: str) -> SourceTags:
    """`tag(n)` per SourceTagsTokenizer:260-304."""
    m = re.fullmatch(r"([^()]+)\(([^()]*)\)", expr.strip())
    if not m:
        raise PlacementSpecParseError(
            "Expecting sourceTag(numOfAllocations) syntax, but met "
            + expr
        )
    try:
        num = int(m.group(2))
    except ValueError:
        raise PlacementSpecParseError(
            "Value of the expression must be an integer, but met "
            + m.group(2)
        ) from None
    return SourceTags(m.group(1).strip(), num)


def _parse_namespace(tag: str) -> tuple[str, str]:
    """parseNameSpace:112-129 — split at the LAST '/', the prefix must
    equal a namespace keyword exactly. No prefix means 'self'."""
    i = tag.rfind("/")
    if i == -1:
        return "self", tag
    ns = tag[:i]
    if ns not in _NAMESPACES:
        raise PlacementSpecParseError("Invalid namespace prefix: " + ns)
    return ns, tag[i + 1:]


def _parse_scope(token: str) -> str:
    low = token.strip().lower()
    if low not in ("node", "rack"):
        raise PlacementSpecParseError(
            "expecting scope to node or rack, but met " + token
        )
    return low


def _parse_target(expr: str) -> Target:
    toks = [t.strip() for t in expr.split(",") if t.strip()]
    if not toks:
        raise PlacementSpecParseError("empty constraint expression")
    op = toks[0].lower()
    if op not in ("in", "notin"):
        raise PlacementSpecParseError(
            "expecting in or notin, but get " + toks[0]
        )
    if len(toks) < 3:
        raise PlacementSpecParseError("Expecting more tokens")
    scope = _parse_scope(toks[1])
    targets = tuple(sorted({_parse_namespace(t) for t in toks[2:]}))
    if op == "in":
        return Target(scope, 1, MAX_CARD, targets)
    return Target(scope, 0, 0, targets)


def _parse_cardinality(expr: str) -> Target:
    toks = [t.strip() for t in expr.split(",") if t.strip()]
    if not toks or toks[0].lower() != "cardinality":
        raise PlacementSpecParseError(
            "expecting cardinality, but met " + (toks[0] if toks else "")
        )
    if len(toks) < 2:
        raise PlacementSpecParseError("Expecting more tokens")
    scope = _parse_scope(toks[1])
    rest = toks[2:]
    if len(rest) < 3:
        raise PlacementSpecParseError(
            "Invalid syntax for a cardinality expression, expecting"
            ' "cardinality,SCOPE,TARGET_TAG,...,TARGET_TAG,'
            'MIN_CARDINALITY,MAX_CARDINALITY" at least 5 elements'
        )

    def to_int(s):
        try:
            return int(s)
        except ValueError:
            raise PlacementSpecParseError(
                "Expecting an Integer, but get " + s
            ) from None

    max_card = to_int(rest[-1])
    min_card = to_int(rest[-2])
    targets = tuple(sorted({_parse_namespace(t) for t in rest[:-2]}))
    return Target(scope, min_card, max_card, targets)


def _parse_node_attr(expr: str) -> NodeAttr:
    toks = [t.strip() for t in expr.split(",") if t.strip()]
    name, opcode, values = "", "EQ", set()
    for tok in toks:
        parts = [p for p in re.split(r"[!=]+", tok) if p]
        if len(parts) > 1:
            opcode = "NE" if "!=" in tok else "EQ"
            name = parts[0]
            values.add(parts[1])
        else:
            values.add(tok)
    if not name:
        raise PlacementSpecParseError(
            "expecting valid expression like k=v or k!=v, but get "
            + expr
        )
    return NodeAttr(opcode, name, tuple(sorted(values)))


def _parse_conjunction(expr: str) -> Conj:
    s = expr.strip()
    if s.startswith(("and", "AND")):
        op = "AND"
    elif s.startswith(("or", "OR")):
        op = "OR"
    else:
        raise PlacementSpecParseError(
            'Excepting starting with "and" or "or", but met ' + s
        )
    m = re.search(r"\((.*)\)", s)
    if not m:
        raise PlacementSpecParseError(
            "Unexpected format, expecting [AND|OR](A:B...) but current "
            "expression is " + s
        )
    children = tuple(
        parse_expression(c)
        for c in _split_outside_brackets(m.group(1), ":")
    )
    if not children:
        raise PlacementSpecParseError("Expecting more tokens")
    return Conj(op, children)


def parse_expression(expr: str):
    """parseExpression:661-721 — try target, cardinality, conjunction,
    node-attribute in that order; first success wins."""
    for p in (_parse_target, _parse_cardinality, _parse_conjunction,
              _parse_node_attr):
        try:
            return p(expr)
        except PlacementSpecParseError:
            continue
    raise PlacementSpecParseError(
        "Invalid constraint expression " + expr
    )


def parse_placement_spec(expression: str) -> list[tuple[SourceTags, object]]:
    """parsePlacementSpec:723-786: `Tag1(N1),P1:Tag2(N2),P2:...` ->
    ordered (SourceTags, constraint) pairs; constraint is None for a
    bare `tag(n)`, SourceTags is empty for a bare node-attribute
    constraint — and then it must be the only entry."""
    result = []
    for spec in _split_outside_brackets(expression, ":"):
        split = re.split(r"\),", spec, maxsplit=1)
        if len(split) == 2:
            st = parse_source_tags(split[0] + ")")
            constraint = parse_expression(split[1])
        else:
            try:
                constraint = _parse_node_attr(spec)
                st = SourceTags("", 0)
            except PlacementSpecParseError:
                st = parse_source_tags(spec)
                constraint = None
        result.append((st, constraint))
    if any(st.is_empty for st, _ in result) and len(result) != 1:
        raise PlacementSpecParseError(
            "Source allocation tags is required for a multi placement"
            " constraint expression."
        )
    return result


# --------------------------------------------------------------------------
# Bridge into operators/constraints.placement_matrix's normal form
# --------------------------------------------------------------------------

def _term_rows(req_id, group_id, node, start_tid):
    rows = []
    if isinstance(node, Target):
        namespaces = {ns for ns, _ in node.targets}
        if len(namespaces) > 1:
            raise NotImplementedError(
                "mixed-namespace targets in one constraint are not "
                "modeled by placement_matrix (single namespace per "
                "term); split the constraint"
            )
        ns = next(iter(namespaces))
        rows.append({
            "req_id": req_id, "group_id": group_id,
            "term_id": start_tid, "scope": node.scope,
            "target_type": "allocation_tag", "namespace": ns,
            "target_key": "",
            "target_values": [t for _, t in node.targets],
            "min_card": node.min_card, "max_card": node.max_card,
            "attr_opcode": "NO_OP",
        })
    elif isinstance(node, NodeAttr):
        if len(node.values) > 1:
            raise NotImplementedError(
                "multi-value node-attribute constraints are not modeled "
                "by placement_matrix (single-value compare per term)"
            )
        rows.append({
            "req_id": req_id, "group_id": group_id,
            "term_id": start_tid, "scope": "node",
            "target_type": "node_attribute", "namespace": "self",
            "target_key": node.key,
            "target_values": list(node.values),
            "min_card": 0, "max_card": MAX_CARD,
            "attr_opcode": node.opcode,
        })
    else:
        raise NotImplementedError(f"unexpected constraint node {node!r}")
    return rows


def to_requests_and_terms(parsed_specs):
    """Flatten parsed (req_id, app_id, SourceTags, constraint) tuples
    into placement_matrix's (requests, terms) row dicts.

    `parsed_specs`: iterable of (req_id, app_id, SourceTags,
    constraint-or-None). Returns (request_rows, term_rows); a None
    constraint contributes a request with no terms (trivially
    satisfied, canSatisfyConstraints:302-306)."""
    requests, terms = [], []
    for req_id, app_id, st, c in parsed_specs:
        combinator = "AND"
        groups: list[list] = []
        if c is None:
            pass
        elif isinstance(c, Conj):
            combinator = c.op
            for child in c.children:
                if isinstance(child, Conj):
                    if c.op != "OR" or child.op != "AND":
                        raise NotImplementedError(
                            "only OR(AND(...)...) nesting is modeled "
                            "(the evaluator's two-level normal form)"
                        )
                    groups.append(list(child.children))
                else:
                    groups.append([child])
            if combinator == "AND":
                # AND of singles: one group holding every term (a
                # group IS an AND of its terms).
                groups = [[g[0] for g in groups]]
                combinator = "AND"
        else:
            groups = [[c]]
        requests.append({
            "req_id": req_id, "app_id": app_id,
            "combinator": combinator,
            "source_tag": st.tag,
            "num_allocations": st.num,
        })
        tid = 0
        for gid, members in enumerate(groups):
            for m in members:
                terms.extend(_term_rows(req_id, gid, m, tid))
                tid += 1
    return requests, terms
