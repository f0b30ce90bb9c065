"""Fill-in-the-middle transform pins (Bavarian et al. 2022)."""

from __future__ import annotations

from hadoop_source_spark.llmops import fim


def _run(spark, texts, rate=1.0, spm=0.0):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: r
        for r in fim.fim_transform(df, fim_rate=rate, spm_rate=spm)
        .collect()
    }


def test_spans_reconstruct_original(spark):
    texts = ["hello world, fill me in", "abc", "x" * 100]
    got = _run(spark, texts, rate=1.0, spm=0.0)
    for i, t in enumerate(texts):
        r = got[i]
        assert r["mode"] == "PSM"
        out = r["output"]
        assert out.startswith("<PRE>")
        p, rest = out[5:].split("<SUF>", 1)
        s, m = rest.split("<MID>", 1)
        assert p + m + s == t
        assert (len(p), len(m), len(s)) == (
            r["len_prefix"], r["len_middle"], r["len_suffix"],
        )


def test_spm_layout(spark):
    got = _run(spark, ["some document text"], rate=1.0, spm=1.0)
    out = got[0]["output"]
    assert out.startswith("<SUF>")
    s, rest = out[5:].split("<PRE>", 1)
    p, m = rest.split("<MID>", 1)
    assert p + m + s == "some document text"


def test_rate_zero_passthrough(spark):
    got = _run(spark, ["untouched"], rate=0.0)
    assert got[0]["mode"] == "NONE"
    assert got[0]["output"] == "untouched"
    assert got[0]["len_prefix"] == len("untouched")
    assert got[0]["len_middle"] == 0 and got[0]["len_suffix"] == 0


def test_deterministic(spark):
    a = _run(spark, ["same text"] * 1)
    b = _run(spark, ["same text"] * 1)
    assert a[0]["output"] == b[0]["output"]
