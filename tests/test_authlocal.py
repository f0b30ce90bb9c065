"""auth_to_local rule-engine pins (KerberosName.java:197-360 Rule,
getShortName:405-429)."""

from __future__ import annotations

from hadoop_source_spark.operators import authlocal
from hadoop_source_spark.operators.authlocal import Rule

RULES = [
    # [1:$1@$0] even-numbered users at the DEV realm, strip realm, /L
    Rule(num_components=1, format="$1@$0",
         match=r"U\d*[02468]@DEV\.EXAMPLE\.COM",
         from_re="@.*$", to_sub="", to_lower=True),
    # [2:$1] service rename, no realm in base
    Rule(num_components=2, format="$1", match=r"svc[0-3]",
         from_re="^svc", to_sub="service"),
    # [2:$2@$0] host-keyed mapping at OTHER.ORG
    Rule(num_components=2, format="$2@$0", match=r"host.*@OTHER\.ORG",
         from_re="@.*$", to_sub=""),
    # [1:$1@$0] no substitution: result keeps '@' -> non-simple
    Rule(num_components=1, format="$1@$0", match=r"U.*@OTHER\.ORG"),
    Rule(is_default=True),
]


def _run(spark, principals):
    out = authlocal.map_principals(
        spark.createDataFrame([(p,) for p in principals],
                              "principal string"),
        RULES,
        default_realm="EXAMPLE.COM",
    ).collect()
    return {r["principal"]: r for r in out}


def test_rule_chain(spark):
    got = _run(
        spark,
        [
            "U12@DEV.EXAMPLE.COM",      # rule 0: strip realm + lower
            "U13@DEV.EXAMPLE.COM",      # odd: no rule applies
            "svc2/host9@ANY.REALM",     # rule 1: rename, realm-free base
            "svc4/host9@OTHER.ORG",     # rule 1 match fails -> rule 2
            "svc4/host9@EXAMPLE.COM",   # DEFAULT ignores component count
            "svc4/host9@ANY.REALM",     # no rule, wrong realm for DEFAULT
            "U7@OTHER.ORG",             # rule 3: '@' survives -> abort
            "U55@EXAMPLE.COM",          # DEFAULT: bare first component
        ],
    )
    r = got["U12@DEV.EXAMPLE.COM"]
    assert (r["matched_rule"], r["short_name"], r["verdict"]) == (
        0, "u12", "OK")
    assert got["U13@DEV.EXAMPLE.COM"]["verdict"] == "NO_MATCHING_RULE"
    assert got["U13@DEV.EXAMPLE.COM"]["matched_rule"] is None
    r = got["svc2/host9@ANY.REALM"]
    assert (r["matched_rule"], r["short_name"]) == (1, "service2")
    r = got["svc4/host9@OTHER.ORG"]
    assert (r["matched_rule"], r["short_name"]) == (2, "host9")
    # the reference's DEFAULT checks ONLY the realm (apply:330-333):
    # a 2-component principal in the default realm still maps to $1
    r = got["svc4/host9@EXAMPLE.COM"]
    assert (r["matched_rule"], r["short_name"]) == (4, "svc4")
    assert got["svc4/host9@ANY.REALM"]["verdict"] == "NO_MATCHING_RULE"
    r = got["U7@OTHER.ORG"]
    assert r["verdict"] == "NON_SIMPLE_NAME"
    assert r["matched_rule"] == 3 and r["short_name"] is None
    r = got["U55@EXAMPLE.COM"]
    assert (r["matched_rule"], r["short_name"]) == (4, "U55")  # case kept


def test_first_applying_rule_wins_and_aborts(spark):
    # a non-simple result does NOT fall through to a later rule that
    # would have produced a simple name
    rules = [
        Rule(num_components=1, format="$1@$0", match=r"A@R"),  # keeps '@'
        Rule(num_components=1, format="$1"),                    # simple
    ]
    out = authlocal.map_principals(
        spark.createDataFrame([("A@R",)], "principal string"),
        rules, default_realm="X",
    ).collect()[0]
    assert out["verdict"] == "NON_SIMPLE_NAME"
    assert out["matched_rule"] == 0


def test_component_count_gates_rules(spark):
    rules = [Rule(num_components=2, format="$1")]
    out = authlocal.map_principals(
        spark.createDataFrame([("a@R",), ("a/b@R",)], "principal string"),
        rules, default_realm="Z",
    ).collect()
    by = {r["principal"]: r for r in out}
    assert by["a@R"]["verdict"] == "NO_MATCHING_RULE"
    assert by["a/b@R"]["short_name"] == "a"
    assert by["a/b@R"]["n_components"] == 2


def test_repeat_flag_replace_all(spark):
    rules = [Rule(num_components=1, format="$1", from_re="o",
                  to_sub="0", repeat=True)]
    out = authlocal.map_principals(
        spark.createDataFrame([("fooboo@R",)], "principal string"),
        rules, default_realm="Z",
    ).collect()[0]
    assert out["short_name"] == "f00b00"


def test_multi_digit_parameter_index(spark):
    # KerberosName.replaceParameters accepts $10 etc.; a 10-component
    # principal's tenth component splices (not "$1 then literal 0")
    comps = "/".join(f"c{i}" for i in range(1, 11))
    rules = [Rule(num_components=10, format="$10")]
    out = authlocal.map_principals(
        spark.createDataFrame([(comps + "@R",)], "principal string"),
        rules, default_realm="Z",
    ).collect()[0]
    assert out["short_name"] == "c10"


def test_non_g_unanchored_pattern_rejected(spark):
    # replace-all would diverge from replaceFirst on 'o' in 'fooboo';
    # the engine refuses instead of silently diverging
    import pytest

    rules = [Rule(num_components=1, format="$1", from_re="o", to_sub="0")]
    with pytest.raises(ValueError, match="not anchored"):
        authlocal.map_principals(
            spark.createDataFrame([("fooboo@R",)], "principal string"),
            rules, default_realm="Z",
        )


def test_non_g_unsound_anchors_rejected(spark):
    # shapes where replace-all still fires twice despite an anchor:
    # top-level alternation defeats '^' ('^a|b': the 'b' branch is
    # unanchored), and a nullable $-anchored body matches again
    # zero-width at the end position ('o*$': 'foo' -> replaceAll
    # 'fXX' vs replaceFirst 'fX')
    import pytest

    for pat in [r"^a|b", r"a|b$", r"o*$", r"\d*$", r"(a)?$"]:
        rules = [Rule(num_components=1, format="$1",
                      from_re=pat, to_sub="X")]
        with pytest.raises(ValueError, match="not anchored"):
            authlocal.map_principals(
                spark.createDataFrame([("foo@R",)], "principal string"),
                rules, default_realm="Z",
            )


def test_format_validation_bad_dollar_and_out_of_range(spark):
    # KerberosName.replaceParameters throws BadFormatString for '$'
    # without digits and for an index past the parameter array
    import pytest

    df = spark.createDataFrame([("a/b@R",)], "principal string")
    with pytest.raises(ValueError, match="followed by a parameter"):
        authlocal.map_principals(
            df, [Rule(num_components=2, format="$1-$")], default_realm="Z"
        )
    with pytest.raises(ValueError, match=r"\$3 not defined"):
        authlocal.map_principals(
            df, [Rule(num_components=2, format="$3")], default_realm="Z"
        )
    # $0 (realm) and $n itself are in range
    out = authlocal.map_principals(
        df, [Rule(num_components=2, format="$2@$0",
                  from_re="@.*$", to_sub="")], default_realm="Z",
    ).collect()[0]
    assert out["short_name"] == "b"


def test_non_g_anchored_pattern_accepted(spark):
    rules = [
        Rule(num_components=1, format="$1", from_re="^foo", to_sub="bar"),
        Rule(num_components=2, format="$1$2", from_re=r"\d+$", to_sub=""),
    ]
    out = authlocal.map_principals(
        spark.createDataFrame(
            [("foofoo@R",), ("a1/b2@R",)], "principal string"
        ),
        rules, default_realm="Z",
    ).collect()
    by = {r["principal"]: r["short_name"] for r in out}
    assert by["foofoo@R"] == "barfoo"   # only the anchored first occ
    assert by["a1/b2@R"] == "a1b"       # trailing digits stripped once
