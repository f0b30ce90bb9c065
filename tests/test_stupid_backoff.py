"""Stupid-backoff trigram LM pins (Brants et al. 2007) — scores
hand-computed on a toy corpus.

Train doc "a b c a b d": trigram counts {abc:1, bca:1, cab:1, abd:1},
bigram counts {ab:2, bc:1, ca:1, bd:1}, unigram counts
{a:2, b:2, c:1, d:1} -> N=6, V=4.
"""

from __future__ import annotations

import math

from hadoop_source_spark.llmops import textstats as ts


def _score(spark, texts):
    train = spark.createDataFrame(
        [(100, "a b c a b d")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = ts.stupid_backoff_score(corpus, train).collect()
    return {r["doc_id"]: r for r in rows}


def test_trigram_hit_relative_frequency(spark):
    got = _score(spark, ["a b c", "c a b"])
    # S(c|a b) = c(abc)/c(ab) = 1/2
    assert got[0]["n_tri_hits"] == 1
    assert got[0]["avg_logscore"] == round(math.log(0.5), 4)
    # S(b|c a) = c(cab)/c(ca) = 1/1
    assert got[1]["avg_logscore"] == round(math.log(1.0), 4)


def test_bigram_backoff_with_alpha(spark):
    # (b,a,b): trigram unseen; bigram (a,b) seen: 0.4 * c(ab)/c(a)
    got = _score(spark, ["b a b"])
    assert got[0]["n_bi_backoffs"] == 1
    assert got[0]["avg_logscore"] == round(math.log(0.4 * 2 / 2), 4)


def test_unigram_backoff_and_oov_floor(spark):
    got = _score(spark, ["b c d", "a b x"])
    # (b,c,d): both higher orders unseen; d seen once:
    # 0.4^2 * (1+1)/(6+4)
    assert got[0]["n_uni_backoffs"] == 1
    assert got[0]["avg_logscore"] == round(math.log(0.16 * 2 / 10), 4)
    # x is OOV: the add-one floor keeps the score finite
    assert got[1]["avg_logscore"] == round(math.log(0.16 * 1 / 10), 4)


def test_short_docs_produce_no_trigrams(spark):
    got = _score(spark, ["a b", "a"])
    assert got == {}
