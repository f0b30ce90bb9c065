"""TimelineReader filter-grammar parser + predicate compiler.

Tree-shape expectations mirror the reference's
TestTimelineReaderWebServicesUtils.java:48-299 (metric filter
associativity, ne vs ene flags, improper brackets, non-numeric
values) and the equality-expression cases for event/relation filters.
"""

from __future__ import annotations

import pytest

from hadoop_source_spark.operators.timelinefilter import (
    Compare,
    Exists,
    FilterList,
    KeyValues,
    TimelineParseError,
    compare_predicate,
    exists_predicate,
    parse_event_filters,
    parse_kv_filters,
    parse_metric_filters,
    parse_relation_filters,
    relation_predicate,
)


def fl(op, *children):
    return FilterList(op, list(children))


def cmpf(op, key, value, must=True):
    return Compare(op, key, value, must)


# --------------------------------------------------------------------------
# Metric (compare-expression) parsing
# --------------------------------------------------------------------------

def test_metric_fully_bracketed_nested():
    # TestTimelineReaderWebServicesUtils.java:50-80
    expr = ("(((key11 ne 234 AND key12 gt 23) AND "
            "(key13 lt 34 OR key14 ge 567)) OR (key21 lt 24 OR key22 le 45))")
    expected = fl(
        "OR",
        fl(
            "AND",
            fl("AND", cmpf("ne", "key11", 234, False),
               cmpf("gt", "key12", 23)),
            fl("OR", cmpf("lt", "key13", 34), cmpf("ge", "key14", 567)),
        ),
        fl("OR", cmpf("lt", "key21", 24), cmpf("le", "key22", 45)),
    )
    assert parse_metric_filters(expr) == expected


def test_metric_ene_vs_ne():
    # :82-96 — ene keeps keyMustExist, ne clears it
    assert parse_metric_filters("abc ene 234") == fl(
        "AND", cmpf("ne", "abc", 234, True))
    assert parse_metric_filters("abc ne 234") == fl(
        "AND", cmpf("ne", "abc", 234, False))


def test_metric_flat_and():
    # :98-116 — bare and bracketed single-level AND give the same list
    expected = fl("AND", cmpf("ne", "abc", 234, False),
                  cmpf("gt", "def", 23))
    assert parse_metric_filters("abc ne 234 AND def gt 23") == expected
    assert parse_metric_filters("(abc ne 234 AND def gt 23)") == expected


def test_metric_mixed_op_fold():
    # :118-131 — op change wraps the accumulated list
    expected = fl(
        "OR",
        fl("AND", cmpf("ne", "abc", 234, False), cmpf("gt", "def", 23)),
        cmpf("lt", "rst", 24),
    )
    assert parse_metric_filters(
        "abc ne 234 AND def gt 23 OR rst lt 24") == expected


def test_metric_or_run_then_and():
    # :150-169 — trailing AND wraps the whole OR run
    expected = fl(
        "AND",
        fl(
            "OR",
            fl("AND", cmpf("ne", "abc", 234, False), cmpf("gt", "def", 23)),
            cmpf("lt", "rst", 24),
            cmpf("le", "xyz", 456),
        ),
        cmpf("ge", "pqr", 2),
    )
    expr = "abc ne 234 AND def gt 23 OR rst lt 24 OR xyz le 456 AND pqr ge 2"
    assert parse_metric_filters(expr) == expected
    # :171-192 — whitespace runs are insignificant
    noisy = ("  abc ne   234       AND       def           gt 23 OR     "
             "rst lt            24     OR xyz     le     456    AND pqr "
             "ge 2        ")
    assert parse_metric_filters(noisy) == expected


def test_metric_deep_nesting_with_internal_fold():
    # :194-235
    expr = ("(((key11 ne 234 AND key12 gt 23 OR key13 lt 24 OR key14 le 456 "
            "AND key15 ge 2) AND (key16 lt 34 OR key17 ge 567)) OR "
            "(key21 lt 24 OR key22 le 45))")
    expected = fl(
        "OR",
        fl(
            "AND",
            fl(
                "AND",
                fl(
                    "OR",
                    fl("AND", cmpf("ne", "key11", 234, False),
                       cmpf("gt", "key12", 23)),
                    cmpf("lt", "key13", 24),
                    cmpf("le", "key14", 456),
                ),
                cmpf("ge", "key15", 2),
            ),
            fl("OR", cmpf("lt", "key16", 34), cmpf("ge", "key17", 567)),
        ),
        fl("OR", cmpf("lt", "key21", 24), cmpf("le", "key22", 45)),
    )
    assert parse_metric_filters(expr) == expected


def test_metric_errors():
    # :281-299 — improper brackets and non-numeric values throw
    with pytest.raises(TimelineParseError):
        parse_metric_filters("(abc ne 234 AND def gt 23")
    with pytest.raises(TimelineParseError):
        parse_metric_filters("abc ne 234 AND def gt 23)")
    with pytest.raises(TimelineParseError):
        parse_metric_filters("abc gt v3")
    with pytest.raises(TimelineParseError):
        parse_metric_filters("abc foo 3")
    with pytest.raises(TimelineParseError):
        parse_metric_filters("abc gt")
    with pytest.raises(TimelineParseError):
        parse_metric_filters("abc ne 3 XOR def gt 4")
    assert parse_metric_filters(None) is None
    assert parse_metric_filters("   ") is None


# --------------------------------------------------------------------------
# KV (config/info) parsing
# --------------------------------------------------------------------------

def test_kv_ops_restricted_and_value_modes():
    # TimelineParserForKVFilters.java:60-66 — lt/gt etc. rejected
    with pytest.raises(TimelineParseError):
        parse_kv_filters("abc gt 3")
    # info mode parses JSON-ish values, config mode keeps strings
    assert parse_kv_filters("abc eq 234") == fl(
        "AND", cmpf("eq", "abc", 234))
    assert parse_kv_filters("abc eq 234", value_as_string=True) == fl(
        "AND", cmpf("eq", "abc", "234"))
    assert parse_kv_filters("abc eq hello") == fl(
        "AND", cmpf("eq", "abc", "hello"))
    assert parse_kv_filters("a ene x AND b ne y") == fl(
        "AND", cmpf("ne", "a", "x", True), cmpf("ne", "b", "y", False))


# --------------------------------------------------------------------------
# Equality expressions (event + relation filters)
# --------------------------------------------------------------------------

def test_event_filter_groups():
    # (e1,e2) AND !(e3,e4) — negated group flips every member
    expected = fl(
        "AND",
        fl("AND", Exists(True, "e1"), Exists(True, "e2")),
        fl("AND", Exists(False, "e3"), Exists(False, "e4")),
    )
    assert parse_event_filters("(e1,e2) AND !(e3,e4)") == expected


def test_event_filter_bare_values_glue_into_current_list():
    assert parse_event_filters("e1,e2") == fl(
        "AND", Exists(True, "e1"), Exists(True, "e2"))
    # delimiter adopts the current list's operator after a fold
    assert parse_event_filters("e1 OR e2,e3") == fl(
        "OR", Exists(True, "e1"), Exists(True, "e2"), Exists(True, "e3"))


def test_event_filter_errors():
    with pytest.raises(TimelineParseError):
        parse_event_filters("e1 e2")  # missing operator
    with pytest.raises(TimelineParseError):
        parse_event_filters("!e1")  # ! must precede a bracket
    with pytest.raises(TimelineParseError):
        parse_event_filters("(e1,e2")  # improper brackets
    assert parse_event_filters(None) is None


def test_relation_filter_key_values():
    expected = fl(
        "OR",
        fl("AND", KeyValues(True, "flow", ("f2", "g1")),
           KeyValues(True, "app", ("a2",))),
        fl("AND", KeyValues(False, "flow", ("f9", "g0"))),
    )
    assert parse_relation_filters(
        "flow:f2:g1,app:a2 OR !(flow:f9:g0)") == expected
    with pytest.raises(TimelineParseError):
        parse_relation_filters("justakey")  # needs key:value


# --------------------------------------------------------------------------
# Predicate compilation semantics (Spark)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def entities(spark):
    from pyspark.sql import functions as F

    rows = [
        # id, metrics, info, events, relates
        (1, {"hb": 10, "mem": 512}, {"user": "u1"},
         ["started", "ok"], {"flow": ["f1", "g1"]}),
        (2, {"hb": 99}, {"user": "u2", "flag": "2"},
         ["started", "HIGH"], {"flow": ["f2"], "app": ["a1"]}),
        (3, {"mem": 128}, {"user": "u1", "flag": "3"},
         ["stopped"], {"app": ["a1", "a2"]}),
    ]
    df = spark.createDataFrame(
        rows, "id int, metrics map<string,bigint>, info map<string,string>,"
        " names array<string>, rel map<string,array<string>>")
    return df, F


def _ids(df, col):
    return sorted(r["id"] for r in df.where(col).select("id").collect())


def test_compare_predicate_missing_key_semantics(entities):
    df, F = entities
    m = F.col("metrics")
    # ne matches when the key is missing; ene does not
    assert _ids(df, compare_predicate(
        parse_metric_filters("hb ne 10"), m)) == [2, 3]
    assert _ids(df, compare_predicate(
        parse_metric_filters("hb ene 10"), m)) == [2]
    # lt/gt require the key
    assert _ids(df, compare_predicate(
        parse_metric_filters("mem ge 128"), m)) == [1, 3]
    assert _ids(df, compare_predicate(
        parse_metric_filters("hb lt 50 OR mem lt 200"), m)) == [1, 3]


def test_kv_predicate_stringly(entities):
    df, F = entities
    i = F.col("info")
    assert _ids(df, compare_predicate(
        parse_kv_filters("flag ne 2"), i, stringly=True)) == [1, 3]
    assert _ids(df, compare_predicate(
        parse_kv_filters("flag ene 2"), i, stringly=True)) == [3]
    assert _ids(df, compare_predicate(
        parse_kv_filters("flag eq 2"), i, stringly=True)) == [2]
    assert _ids(df, compare_predicate(
        parse_kv_filters("user eq u1 AND flag ne 3"), i,
        stringly=True)) == [1]


def test_exists_predicate(entities):
    df, F = entities
    n = F.col("names")
    assert _ids(df, exists_predicate(
        parse_event_filters("(started) AND !(HIGH)"), n)) == [1]
    assert _ids(df, exists_predicate(
        parse_event_filters("started,ok OR stopped"), n)) == [1, 3]


def test_relation_predicate(entities):
    df, F = entities
    r = F.col("rel")
    # key must exist; EQUAL needs all ids, NOT_EQUAL needs none
    assert _ids(df, relation_predicate(
        parse_relation_filters("flow:f1:g1"), r)) == [1]
    assert _ids(df, relation_predicate(
        parse_relation_filters("app:a1"), r)) == [2, 3]
    assert _ids(df, relation_predicate(
        parse_relation_filters("!(flow:f2)"), r)) == [1]
    assert _ids(df, relation_predicate(
        parse_relation_filters("app:a1:a2 OR flow:f2"), r)) == [2, 3]


# --------------------------------------------------------------------------
# Data-to-retrieve prefix lists (TestTimelineReaderWebServicesUtils:849-918)
# --------------------------------------------------------------------------

def test_data_to_retrieve_parsing():
    from hadoop_source_spark.operators.timelinefilter import (
        Prefix,
        parse_data_to_retrieve,
    )

    expected = fl("OR", Prefix(True, "abc"), Prefix(True, "def"))
    for expr in ("abc,def", "(abc,def)", "   (   abc  ,   def  )   ",
                 "    abc  ,   def   "):
        assert parse_data_to_retrieve(expr) == expected, expr
    neg = fl("AND", Prefix(False, "abc"), Prefix(False, "def"))
    assert parse_data_to_retrieve("!(abc,def)") == neg
    assert parse_data_to_retrieve(" !  (   abc  ,  def  )  ") == neg
    assert parse_data_to_retrieve("!(abc)") == fl(
        "AND", Prefix(False, "abc"))
    assert parse_data_to_retrieve("(abc)") == fl("OR", Prefix(True, "abc"))
    assert parse_data_to_retrieve("abc") == fl("OR", Prefix(True, "abc"))
    assert parse_data_to_retrieve(None) is None
    assert parse_data_to_retrieve("  ") is None
    assert parse_data_to_retrieve("()") is None
    with pytest.raises(TimelineParseError):
        parse_data_to_retrieve("!abc,def")  # ! without bracket
    with pytest.raises(TimelineParseError):
        parse_data_to_retrieve("!x(abc)")  # junk between ! and (
    with pytest.raises(TimelineParseError):
        parse_data_to_retrieve("!(abc")  # NOT without closing bracket


def test_retrieve_keys_map_filter(spark):
    from pyspark.sql import functions as F

    from hadoop_source_spark.operators.timelinefilter import (
        parse_data_to_retrieve,
        retrieve_keys,
    )

    df = spark.createDataFrame(
        [(1, {"cfg.a": "1", "cfg.b": "2", "env.u": "3", "sys.f": "4"})],
        "id int, m map<string,string>")

    def keys(expr):
        c = retrieve_keys(parse_data_to_retrieve(expr), F.col("m"))
        return sorted(df.select(F.map_keys(c).alias("k")).head()["k"])

    assert keys("cfg.") == ["cfg.a", "cfg.b"]
    assert keys("(cfg.,env.)") == ["cfg.a", "cfg.b", "env.u"]
    assert keys("!(cfg.,sys.)") == ["env.u"]
    assert keys(None) == ["cfg.a", "cfg.b", "env.u", "sys.f"]


# --------------------------------------------------------------------------
# UID codec (TimelineReaderUtils.split/joinAndEscape, TestTimelineReaderUtils)
# --------------------------------------------------------------------------

def test_uid_roundtrip_and_escapes(spark):
    from pyspark.sql import functions as F

    from hadoop_source_spark.operators.timelinefilter import (
        uid_decode,
        uid_encode,
    )

    rows = [
        (1, "yarn-cluster", "user1", "flow_name"),
        (2, "yarn!cluster", "us*er", "fl*!ow"),   # both escapes
        (3, "c", "**", "!!"),                      # runs of specials
        (4, "c", " padded ", "flow"),              # trim quirk
    ]
    df = spark.createDataFrame(rows, "id int, a string, b string, c string")
    out = df.select(
        "id", "a", "b", "c",
        uid_encode(F.col("a"), F.col("b"), F.col("c")).alias("uid"),
    ).withColumn("parts", uid_decode(F.col("uid")))
    got = {r["id"]: r for r in out.collect()}
    # clean and escaped parts round-trip exactly
    for i in (1, 2, 3):
        r = got[i]
        assert r["parts"] == [r["a"], r["b"], r["c"]], r
    # the reference trims each split part: padded parts do NOT round-trip
    assert got[4]["parts"] == ["c", "padded", "flow"]
    # encode layout spot-checks
    assert got[1]["uid"] == "yarn-cluster!user1!flow_name"
    assert got[2]["uid"] == "yarn*!cluster!us**er!fl***!ow"


def test_uid_decode_malformed_is_null(spark):
    from pyspark.sql import functions as F

    from hadoop_source_spark.operators.timelinefilter import uid_decode

    df = spark.createDataFrame(
        [("a*b",), ("ab*",), ("a**b!c",), ("a*!b",)], "uid string")
    got = df.select("uid", uid_decode(F.col("uid")).alias("p")).collect()
    by = {r["uid"]: r["p"] for r in got}
    # '*' before a normal char / trailing '*' are invalid escapes
    assert by["a*b"] is None
    assert by["ab*"] is None
    # properly escaped forms decode
    assert by["a**b!c"] == ["a*b", "c"]
    assert by["a*!b"] == ["a!b"]
