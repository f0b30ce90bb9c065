"""Kerberos auth_to_local principal mapping: the rule engine every
secure cluster runs on each authenticated principal
(hadoop.security.auth_to_local).

Reference semantics (`hadoop-auth/.../util/KerberosName.java`):

- A principal ``comp1/comp2@REALM`` becomes the parameter array
  [realm, comp1, comp2] (``apply:321-328``).
- A ``RULE:[n:format](match)s/from/to/g?/L?`` applies only when the
  principal has exactly n components (:334); the format's ``$i``
  parameters build the base string (``replaceParameters:273-299``,
  $0 = realm); the optional match pattern must FULLY match the base
  (Java ``matches()``, :337); the optional substitution replaces the
  first occurrence — all occurrences with the ``g`` flag
  (``replaceSubstitution:310-318``).
- Rules evaluate IN ORDER; the first rule producing a result decides
  (``getShortName:405-429``). Under the default ``hadoop`` mechanism
  a result still containing ``/`` or ``@`` aborts as a non-simple
  name (:344-349) — it does NOT fall through to later rules. ``/L``
  lowercases AFTER that check (:350-352). ``DEFAULT`` maps
  ``user@<default realm>`` to the bare user. No applicable rule is
  an error (NoMatchingRule :429).

Spark-first: the rule list is conf-sized — the whole cascade compiles
to ONE codegen when-chain over split/regexp expressions (Spark's
regexps are Java regexps, the same engine the reference uses); no
joins, no shuffles, map-side at any scale. Non-``g`` substitutions
are compiled to ``regexp_replace`` (replace-all): callers must use
first-occurrence-only patterns (the anchored shapes real
auth_to_local configs use) — same documented invariant as
`llmops/urlops`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OK = "OK"
NON_SIMPLE = "NON_SIMPLE_NAME"
NO_MATCHING_RULE = "NO_MATCHING_RULE"


@dataclass(frozen=True)
class Rule:
    """One auth_to_local rule; ``is_default`` models ``DEFAULT``."""

    is_default: bool = False
    num_components: int = 0
    format: str | None = None
    match: str | None = None
    from_re: str | None = None
    to_sub: str | None = None
    repeat: bool = False
    to_lower: bool = False


def _format_base(
    fmt: str, realm: Column, comps: Column, num_components: int
) -> Column:
    """replaceParameters: '$i' splices params, text copies through.

    Parameter indices may be multi-digit, matching the reference's
    ``\\$(\\d*)`` parser (``KerberosName.replaceParameters``); like
    the reference, a ``$`` not followed by digits and an index past
    the parameter array ($0 = realm, $1..$n the components) both
    throw BadFormatString — we raise at compile time."""
    parts: list[Column] = []
    for tok in re.split(r"(\$\d*)", fmt):
        if not tok:
            continue
        if tok == "$":
            raise ValueError(
                "bad format %r: '$' must be followed by a parameter "
                "number (KerberosName BadFormatString)" % fmt
            )
        if re.fullmatch(r"\$\d+", tok):
            idx = int(tok[1:])
            if idx > num_components:
                raise ValueError(
                    "bad format %r: parameter $%d not defined for a "
                    "%d-component rule (KerberosName BadFormatString)"
                    % (fmt, idx, num_components)
                )
            parts.append(realm if idx == 0 else F.get(comps, idx - 1))
        else:
            parts.append(F.lit(tok))
    return F.concat(*parts) if parts else F.lit("")


def _ends_with_unescaped_dollar(pattern: str) -> bool:
    if not pattern.endswith("$"):
        return False
    backslashes = len(pattern[:-1]) - len(pattern[:-1].rstrip("\\"))
    return backslashes % 2 == 0


def _has_top_level_alternation(pattern: str) -> bool:
    """A ``|`` at paren-depth 0 outside a character class splits the
    pattern into independently-firing branches, defeating any ^/$
    anchor on the other branch (e.g. ``^a|b``)."""
    depth = 0
    in_class = False
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "|" and depth == 0:
            return True
        i += 1
    return False


def _at_most_one_match(pattern: str) -> bool:
    """True when a regexp provably fires at most once per input, so
    replace-all (`regexp_replace`) equals the reference's
    ``replaceFirst``. Conditions: no top-level alternation (either
    branch of ``^a|b`` fires on its own), and either anchored at
    ``^`` (only position 0 qualifies outside MULTILINE mode, which
    Spark/Java regexps default off) or anchored at an unescaped
    trailing ``$`` with a body that cannot match the empty string —
    a nullable body like ``o*$`` matches AGAIN zero-width at the end
    position right after the first replacement under Java
    ``replaceAll`` ('foo' -> 'fXX' vs replaceFirst 'fX')."""
    if _has_top_level_alternation(pattern):
        return False
    if pattern.startswith("^"):
        return True
    if not _ends_with_unescaped_dollar(pattern):
        return False
    try:
        nullable = re.fullmatch(pattern, "") is not None
    except re.error:
        return False
    return not nullable


def map_principals(
    principals: DataFrame,
    rules: list[Rule],
    *,
    default_realm: str,
    principal_col: str = "principal",
) -> DataFrame:
    """Evaluate the rule chain over a principal column.

    Returns the input keys plus (realm, n_components, matched_rule
    int nullable, short_name nullable, verdict).

    Substitutions compile to ``regexp_replace`` (replace-all); a rule
    without the ``g`` flag (``repeat=False``) is accepted only when
    its pattern provably matches at most once (anchored ``^``/``$``),
    otherwise replace-all would silently diverge from the reference's
    ``replaceFirst`` (``replaceSubstitution:310-318``) and we raise
    instead."""
    for r in rules:
        if (
            not r.is_default
            and r.from_re is not None
            and not r.repeat
            and not _at_most_one_match(r.from_re)
        ):
            raise ValueError(
                "non-'g' substitution pattern %r is not anchored: "
                "replace-all would diverge from replaceFirst; anchor "
                "the pattern with ^/$ or set repeat=True" % r.from_re
            )
    p = F.col(principal_col)
    realm = F.regexp_extract(p, "@(.*)$", 1)
    name_part = F.regexp_replace(p, "@.*$", "")
    comps = F.split(name_part, "/")
    n_comp = F.size(comps)

    picked: Column = F.lit(None).cast(
        "struct<idx:int,result:string,lower:boolean>"
    )
    for i, r in enumerate(rules):
        if r.is_default:
            applies = realm == default_realm
            result = F.get(comps, 0)
        else:
            base = _format_base(
                r.format or "", realm, comps, r.num_components
            )
            applies = n_comp == r.num_components
            if r.match is not None:
                applies = applies & base.rlike(f"^(?:{r.match})$")
            result = (
                F.regexp_replace(base, r.from_re, r.to_sub)
                if r.from_re is not None
                else base
            )
        step = F.struct(
            F.lit(i).alias("idx"),
            result.alias("result"),
            F.lit(r.to_lower).alias("lower"),
        )
        picked = (
            F.when(applies, step)
            if i == 0
            else picked.when(applies, step)
        )
    raw = picked["result"]
    non_simple = raw.rlike("[/@]")
    verdict = (
        F.when(picked.isNull(), F.lit(NO_MATCHING_RULE))
        .when(non_simple, F.lit(NON_SIMPLE))
        .otherwise(F.lit(OK))
    )
    short = F.when(
        verdict == OK,
        F.when(picked["lower"], F.lower(raw)).otherwise(raw),
    )
    return principals.select(
        "*",
        realm.alias("realm"),
        n_comp.cast("int").alias("n_components"),
        picked["idx"].alias("matched_rule"),
        short.alias("short_name"),
        verdict.alias("verdict"),
    )
