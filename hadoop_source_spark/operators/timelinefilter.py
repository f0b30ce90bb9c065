"""TimelineReader REST filter-expression grammar -> Spark predicates.

The reference's only real query *language*: ATSv2 REST filter strings
are parsed into a TimelineFilterList tree and evaluated per entity.

Reference semantics:
- `hadoop-yarn-server-timelineservice/.../reader/
  TimelineParserForCompareExpr.java:32-56` — compare expressions
  `(<key> <compareop> <value>) <AND|OR> ...` with compareop in
  {eq, ne, ene, lt, gt, le, ge}; `ne` matches when the key is absent,
  `ene` ("exists and not equals") requires the key to be present
  (:184-204 sets the keyMustExist flag). Metric filters accept all
  seven ops with integral values (TimelineParserForNumericFilters.java:
  35-44 rejects non-numbers); config/info KV filters accept only
  eq/ne/ene (TimelineParserForKVFilters.java:60-66) and fall back to
  the raw string when the value doesn't parse as JSON (:47-57).
- `TimelineParserForEqualityExpr.java:32-48` — equality expressions
  `(<value>,<value>) <AND|OR> !(<value>,...)`; `!` negates the whole
  bracketed group. Event filters check event-name existence
  (TimelineParserForExistFilters.java); relation filters split each
  value on ":" into key + id set (TimelineParserForRelationFilters.java:
  54-70, <2 parts is a parse error).
- AND/OR fold left-to-right with the reference's exact associativity
  (TimelineParserForCompareExpr.java:215-240 parseOp): a new logical
  op wraps the accumulated list when the op CHANGES or a bracket just
  closed; otherwise filters keep appending to the current flat list.
  A list with no explicit op is AND (TimelineFilterList.java:56-58).
  Tree shapes are pinned against the expectations of
  `TestTimelineReaderWebServicesUtils.java:48-299` in
  tests/test_timelinefilter.py.
- Evaluation (TimelineStorageUtils.java): compare filters match only
  when the metric key exists for lt/le/gt/ge/eq (:276-285); key-values
  (relation) filters require the key and then ALL ids present (EQUAL)
  or ALL ids absent (NOT_EQUAL) (:60-87); an empty filter list matches
  nothing (:313-318). The missing-key behavior of ne vs ene follows
  the parser contract above (the HBase TimelineFilterUtils path honors
  it; the filesystem reader predates the flag).

Spark-first: parsing runs on the driver over config-sized strings;
the compiled predicate is a pure Column expression over map/array
entity columns — whole-stage codegen, no UDFs, filters pushed to the
scan where the source supports map pushdown.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


class TimelineParseError(ValueError):
    """Raised for malformed filter expressions (mirrors
    TimelineParseException)."""


# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Compare:
    """Metric compare filter / config-info KV filter leaf."""
    op: str  # eq | ne | lt | le | gt | ge  (ene normalizes to ne+must_exist)
    key: str
    value: object
    key_must_exist: bool = True


@dataclass(frozen=True)
class Exists:
    """Event-name existence leaf: present=False under a !(...) group."""
    present: bool
    value: str


@dataclass(frozen=True)
class KeyValues:
    """Relation leaf: all `values` related under `key` (or none, when
    present=False)."""
    present: bool
    key: str
    values: tuple


@dataclass(frozen=True)
class Prefix:
    """Config/metric-to-retrieve leaf: keep keys with this prefix
    (present=True) or drop them (present=False)."""
    present: bool
    prefix: str


@dataclass
class FilterList:
    op: str = "AND"
    children: list = field(default_factory=list)


_COMPARE_OPS = frozenset({"eq", "ne", "ene", "lt", "le", "gt", "ge"})
_KV_OPS = frozenset({"eq", "ne", "ene"})


# --------------------------------------------------------------------------
# Tokenizers
# --------------------------------------------------------------------------

def _tokens(expr: str, specials: str) -> list[str]:
    """Split into words and single-char special tokens; whitespace
    separates words but emits no token."""
    out: list[str] = []
    word: list[str] = []
    for ch in expr:
        if ch == " " or ch in specials:
            if word:
                out.append("".join(word))
                word = []
            if ch != " ":
                out.append(ch)
        else:
            word.append(ch)
    if word:
        out.append("".join(word))
    return out


def _fold_op(flist, cur, lop, just_closed):
    """The reference's parseOp list folding: append the pending filter,
    then wrap the accumulated list when the logical op changes or a
    bracket just closed."""
    if flist is None:
        flist = FilterList(lop)
    if cur is not None:
        flist.children.append(cur)
    if just_closed or flist.op != lop:
        flist = FilterList(lop, [flist])
    return flist


def _finish(flist, cur, name):
    if flist is None or not flist.children:
        if cur is None:
            raise TimelineParseError(f"invalid expression for {name}")
        return FilterList("AND", [cur])
    if cur is not None:
        flist.children.append(cur)
    return flist


# --------------------------------------------------------------------------
# Compare-expression parser (metric + config/info filters)
# --------------------------------------------------------------------------

def _parse_compare_expr(expr, parse_value, allowed_ops, name):
    if expr is None or not expr.strip():
        return None
    stack: list = []
    flist = None
    cur = None
    just_closed = False
    state = "KEY"
    key = None
    op = None
    for t in _tokens(expr.strip(), "()"):
        if t == "(":
            if state != "KEY":
                raise TimelineParseError(
                    f"unexpected opening bracket in {name}")
            stack.append(flist)
            flist = None
        elif t == ")":
            if state != "OP" or not stack:
                raise TimelineParseError(
                    f"unexpected closing bracket in {name}")
            if cur is not None:
                if flist is None:
                    flist = FilterList("AND")
                flist.children.append(cur)
                cur = None
            if flist is None:
                raise TimelineParseError(f"empty bracket group in {name}")
            parent = stack.pop()
            if parent is not None:
                parent.children.append(flist)
                flist = parent
            just_closed = True
        elif state == "KEY":
            key = t
            state = "CMPOP"
        elif state == "CMPOP":
            low = t.lower()
            if low not in _COMPARE_OPS:
                raise TimelineParseError(
                    f"compare op cannot be parsed for {name}: {t!r}")
            if low not in allowed_ops:
                raise TimelineParseError(
                    f"compare op {low!r} not supported for {name}")
            op = low
            state = "VALUE"
        elif state == "VALUE":
            cur = Compare(
                "ne" if op == "ene" else op,
                key,
                parse_value(t),
                key_must_exist=(op != "ne"),
            )
            state = "OP"
        else:  # OP
            low = t.lower()
            if low not in ("and", "or"):
                raise TimelineParseError(
                    f"operator cannot be parsed for {name}: {t!r}")
            flist = _fold_op(flist, cur, low.upper(), just_closed)
            cur = None
            just_closed = False
            state = "KEY"
    if stack:
        raise TimelineParseError(f"improper brackets in {name}")
    if state in ("CMPOP", "VALUE"):
        raise TimelineParseError(f"incomplete expression for {name}")
    return _finish(flist, cur, name)


def _json_or_string(s: str):
    """GenericObjectMapper-style lenient value parse: JSON literal when
    it parses, raw string otherwise."""
    try:
        return json.loads(s)
    except ValueError:
        return s


def parse_metric_filters(expr: str | None) -> FilterList | None:
    """TimelineParserForNumericFilters: all 7 compare ops, integral
    values only."""
    def integral(s):
        v = _json_or_string(s)
        if isinstance(v, bool) or not isinstance(v, int):
            raise TimelineParseError(f"metric filter value not a number: {s!r}")
        return v

    return _parse_compare_expr(expr, integral, _COMPARE_OPS, "Metric Filter")


def parse_kv_filters(expr: str | None, value_as_string: bool = False
                     ) -> FilterList | None:
    """TimelineParserForKVFilters: eq/ne/ene only; config filters pass
    value_as_string=True, info filters parse JSON-ish values."""
    parse = (lambda s: s) if value_as_string else _json_or_string
    return _parse_compare_expr(expr, parse, _KV_OPS, "Config/Info Filter")


# --------------------------------------------------------------------------
# Equality-expression parser (event + relation filters)
# --------------------------------------------------------------------------

def _parse_equality_expr(expr, delim, make_leaf, name):
    if expr is None or not expr.strip():
        return None
    stack: list = []
    flist = None
    cur = None
    just_closed = False
    present = True  # compare op of the current group
    negate_next = False
    state = "GROUP"  # GROUP: expecting ! ( or bare value; VALUE: in-group
    for t in _tokens(expr.strip(), "()!" + delim):
        if t == "!":
            if state not in ("GROUP", "VALUE"):
                raise TimelineParseError(f"unexpected ! in {name}")
            negate_next = True
        elif t == "(":
            if state not in ("GROUP", "VALUE"):
                raise TimelineParseError(
                    f"unexpected opening bracket in {name}")
            stack.append(flist)
            flist = None
            present = not negate_next
            negate_next = False
            state = "VALUE"
        elif t == ")":
            if state != "SEP" or not stack:
                raise TimelineParseError(
                    f"unexpected closing bracket in {name}")
            if cur is not None:
                if flist is None:
                    flist = FilterList("AND")
                flist.children.append(cur)
                cur = None
            if flist is None:
                raise TimelineParseError(f"empty bracket group in {name}")
            parent = stack.pop()
            if parent is not None:
                parent.children.append(flist)
                flist = parent
            just_closed = True
            present = True
        elif t == delim:
            # Delimiter glues the next value into the current flat list
            # under the SAME group compare-op (reference handleDelimiter).
            if state != "SEP":
                raise TimelineParseError(f"misplaced delimiter in {name}")
            if flist is None:
                flist = FilterList("AND")
            if cur is not None:
                flist.children.append(cur)
                cur = None
            state = "VALUE"
        elif negate_next:
            raise TimelineParseError(f"! must precede a bracket in {name}")
        elif state in ("GROUP", "VALUE"):
            cur = make_leaf(present, t)
            state = "SEP"
        else:  # SEP: only a logical op may follow a completed value
            low = t.lower()
            if low not in ("and", "or"):
                raise TimelineParseError(
                    f"operator cannot be parsed for {name}: {t!r}")
            flist = _fold_op(flist, cur, low.upper(), just_closed)
            cur = None
            just_closed = False
            present = True
            state = "GROUP"
    if stack:
        raise TimelineParseError(f"improper brackets in {name}")
    if negate_next or state == "VALUE":
        raise TimelineParseError(f"incomplete expression for {name}")
    return _finish(flist, cur, name)


def parse_event_filters(expr: str | None) -> FilterList | None:
    """TimelineParserForExistFilters over the comma delimiter."""
    return _parse_equality_expr(
        expr, ",", lambda p, v: Exists(p, v), "Event Filter")


def parse_data_to_retrieve(expr: str | None) -> FilterList | None:
    """TimelineParserForDataToRetrieve (confstoretrieve /
    metricstoretrieve): `prefix,prefix` or `(prefix,...)` keeps keys
    matching ANY prefix (OR of EQUAL prefix filters); `!(prefix,...)`
    keeps keys matching NONE (AND of NOT_EQUAL). A `!` requires a
    bracketed group with nothing but whitespace before `(` and a
    trailing `)`; an empty group returns None (retrieve nothing
    extra). Pinned against TestTimelineReaderWebServicesUtils.java:
    849-918 (testDataToRetrieve)."""
    if expr is None:
        return None
    s = expr.strip()
    if not s:
        return None
    neg = False
    i = s.find("(")
    if s[0] == "!":
        if i == -1 or s[1:i].strip():
            raise TimelineParseError(
                "Invalid config/metric to retrieve expression")
        neg = True
        if not s.endswith(")"):
            raise TimelineParseError(
                "Invalid config/metric to retrieve expression")
    elif i > 0:
        raise TimelineParseError(
            "Invalid config/metric to retrieve expression")
    if i != -1 and s.endswith(")"):
        s = s[i + 1:-1].strip()
    if not s:
        return None
    return FilterList(
        "AND" if neg else "OR",
        [Prefix(not neg, p.strip()) for p in s.split(",")],
    )


def retrieve_keys(flist: FilterList | None, m: Column) -> Column:
    """Apply a data-to-retrieve prefix list to a map column: keep the
    entries whose key matches every NOT_EQUAL filter and (when the
    list is the OR-of-EQUAL form) at least one prefix. None keeps the
    map whole (the REST layer's 'no filter' default)."""
    if flist is None:
        return m

    def cond(k: Column) -> Column:
        out = None
        for f in flist.children:
            c = k.startswith(f.prefix)
            if not f.present:
                c = ~c
            out = c if out is None else (
                (out & c) if flist.op == "AND" else (out | c)
            )
        return out if out is not None else F.lit(False)

    return F.map_filter(m, lambda k, v: cond(k))


UID_DELIM = "!"
UID_ESCAPE = "*"
# Sentinels for the codegen-side escape-aware split: control chars that
# cannot appear in YARN ids (cluster/user/flow/app ids are printable).
_S_ESC = "\x01"
_S_DELIM = "\x02"


def uid_encode(*parts: Column) -> Column:
    """ATSv2 REST UID join (TimelineReaderUtils.joinAndEscape, used by
    TimelineUIDConverter.joinAndEscapeUIDParts:254-258): each part has
    '*' doubled and '!' prefixed with '*', then parts join on '!'.
    Pure string codegen — no UDF."""
    escaped = [
        F.replace(F.replace(p, F.lit(UID_ESCAPE),
                            F.lit(UID_ESCAPE * 2)),
                  F.lit(UID_DELIM), F.lit(UID_ESCAPE + UID_DELIM))
        for p in parts
    ]
    return F.concat_ws(UID_DELIM, *escaped)


def uid_decode(uid: Column) -> Column:
    """Escape-aware UID split (TimelineReaderUtils.split:65-127):
    '*'-escaped delimiters/escapes are literal; every part is TRIMMED
    (the reference builder trims each split part). Implemented as a
    sentinel dance in whole-stage codegen: '**' and '*!' swap to
    control chars, the remaining '!' split, then each part restores
    and trims. Returns array<string>; malformed escapes (a '*' not
    followed by '*' or '!', including a trailing '*') yield NULL — the
    batch-mode loud equivalent of the reference's
    IllegalArgumentException."""
    esc_folded = F.replace(uid, F.lit(UID_ESCAPE * 2), F.lit(_S_ESC))
    # after folding '**', any remaining '*' must sit before '!'
    malformed = esc_folded.rlike(r"\*(?!!)")
    folded = F.replace(
        esc_folded, F.lit(UID_ESCAPE + UID_DELIM), F.lit(_S_DELIM)
    )
    parts = F.transform(
        F.split(folded, re.escape(UID_DELIM)),
        lambda p: F.trim(
            F.replace(
                F.replace(p, F.lit(_S_DELIM), F.lit(UID_DELIM)),
                F.lit(_S_ESC), F.lit(UID_ESCAPE),
            )
        ),
    )
    return F.when(~malformed, parts)


def parse_relation_filters(expr: str | None) -> FilterList | None:
    """TimelineParserForRelationFilters: comma between filters, colon
    between a filter's key and its ids."""
    def leaf(p, v):
        parts = [x.strip() for x in v.split(":")]
        if len(parts) < 2:
            raise TimelineParseError("invalid relation filter expression")
        return KeyValues(p, parts[0], tuple(parts[1:]))

    return _parse_equality_expr(expr, ",", leaf, "Relation Filter")


# --------------------------------------------------------------------------
# Compilation to Spark Column predicates
# --------------------------------------------------------------------------

def _compile(node, leaf) -> Column:
    if isinstance(node, FilterList):
        if not node.children:
            return F.lit(False)  # matchFilters: empty list matches nothing
        out = _compile(node.children[0], leaf)
        for child in node.children[1:]:
            nxt = _compile(child, leaf)
            out = (out & nxt) if node.op == "AND" else (out | nxt)
        return out
    return leaf(node)


def compare_predicate(flist: FilterList | None, m: Column,
                      stringly: bool = False) -> Column:
    """Predicate over a map column for a compare/KV filter tree.

    `m` is map<string,long> for metrics or map<string,string> for
    config/info (pass stringly=True to compare the parsed value's
    string form, matching a string-typed store)."""
    if flist is None:
        return F.lit(True)

    def leaf(f: Compare) -> Column:
        has = F.map_contains_key(m, f.key)
        v = m.getItem(f.key)
        lit = F.lit(str(f.value)) if stringly else F.lit(f.value)
        if f.op == "eq":
            return has & (v == lit)
        if f.op == "ne":
            neq = v != lit
            return (has & neq) if f.key_must_exist else F.when(
                has, neq).otherwise(F.lit(True))
        cmp = {
            "lt": v < lit, "le": v <= lit,
            "gt": v > lit, "ge": v >= lit,
        }[f.op]
        return has & cmp

    return _compile(flist, leaf)


def exists_predicate(flist: FilterList | None, names: Column) -> Column:
    """Predicate over an array<string> column for an event-exists tree."""
    if flist is None:
        return F.lit(True)

    def leaf(f: Exists) -> Column:
        c = F.array_contains(names, f.value)
        return c if f.present else ~c

    return _compile(flist, leaf)


def relation_predicate(flist: FilterList | None, rel: Column) -> Column:
    """Predicate over a map<string,array<string>> relations column:
    key must exist; EQUAL needs every id present, NOT_EQUAL every id
    absent (TimelineStorageUtils.java:60-87)."""
    if flist is None:
        return F.lit(True)

    def leaf(f: KeyValues) -> Column:
        has = F.map_contains_key(rel, f.key)
        ids = rel.getItem(f.key)
        cond = F.lit(True)
        for v in f.values:
            c = F.array_contains(ids, v)
            cond = cond & (c if f.present else ~c)
        return has & cond

    return _compile(flist, leaf)
