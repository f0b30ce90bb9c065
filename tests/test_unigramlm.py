"""Unigram-LM tokenizer pins (Kudo 2018 / SentencePiece unigram:
seed -> soft-EM forward-backward -> prune -> Viterbi)."""

from __future__ import annotations

import math

from hadoop_source_spark.llmops import unigramlm


CORPUS = [("abab", 50), ("ab", 30), ("cd", 20), ("abcd", 10)]


def test_seed_contains_all_chars_and_top_substrings():
    seed = unigramlm.seed_vocab(CORPUS, seed_size=6, max_len=4)
    for c in "abcd":
        assert c in seed
    assert "ab" in seed  # by far the best-scoring multi-char piece
    assert all(lp < 0 for lp in seed.values())


def test_em_increases_likelihood():
    logp = unigramlm.seed_vocab(CORPUS, seed_size=10, max_len=4)
    _, ll0 = unigramlm._e_step(CORPUS, logp, 4)
    for _ in range(3):
        counts, _ = unigramlm._e_step(CORPUS, logp, 4)
        logp = unigramlm._m_step(counts, logp)
    _, ll1 = unigramlm._e_step(CORPUS, logp, 4)
    assert ll1 >= ll0 - 1e-9


def test_train_prunes_to_target_and_keeps_chars():
    logp = unigramlm.train(CORPUS, vocab_size=6, seed_size=20, max_len=4)
    assert len(logp) <= 6
    for c in "abcd":
        assert c in logp
    # probabilities are a (sub-)distribution
    assert sum(math.exp(v) for v in logp.values()) <= 1.0 + 1e-9
    # the dominant repeated piece survives pruning
    assert "ab" in logp


def test_viterbi_prefers_trained_piece_and_is_lossless():
    logp = unigramlm.train(CORPUS, vocab_size=6, seed_size=20, max_len=4)
    seg = unigramlm.viterbi("ababab", logp, 4)
    assert "".join(seg) == "ababab"
    assert seg == ["ab", "ab", "ab"]
    seg2 = unigramlm.viterbi("abcd", logp, 4)
    assert "".join(seg2) == "abcd"


def test_unknown_characters_emit_unk():
    logp = unigramlm.train(CORPUS, vocab_size=6, seed_size=20, max_len=4)
    seg = unigramlm.viterbi("axb", logp, 4)
    assert seg == ["a", unigramlm.UNK, "b"]


def test_deterministic_tiebreak():
    # two pieces with identical probabilities: smaller start index
    # (longer final piece) wins, then the smaller string
    logp = {"a": math.log(0.25), "b": math.log(0.25),
            "ab": math.log(0.5)}
    assert unigramlm.viterbi("ab", logp, 2) == ["ab"]


def test_segment_docs_spark(spark):
    docs = spark.createDataFrame(
        [(1, "abab ab Quix"), (2, ""), (3, "cd cd cd")],
        "doc_id long, text string",
    )
    logp = unigramlm.train(CORPUS, vocab_size=8, seed_size=20, max_len=4)
    rows = {
        r["doc_id"]: r
        for r in unigramlm.segment_docs(docs, logp, max_len=4).collect()
    }
    assert rows[2]["n_words"] == 0 and rows[2]["n_pieces"] == 0
    assert rows[3]["n_words"] == 3
    assert rows[3]["n_pieces"] == 3  # 'cd' is a trained piece
    assert rows[1]["n_unk"] >= 2     # 'q', 'x' (and maybe 'i', 'u') unseen
    # covered piece chars never exceed input chars
    assert rows[1]["piece_chars"] <= len("ababab") + len("quix")
