"""Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization";
the SentencePiece unigram model) — the missing alternative to BPE in
the tokenizer family: instead of greedy merges, fit piece
probabilities by EM over a substring lattice and PRUNE a large seed
vocabulary down to the target size.

Public algorithm:

1. Seed: take every substring (length <= max_len) of the corpus
   words, scored by frequency x length; keep the top seed_size plus
   ALL single characters (coverage guarantee).
2. EM rounds: the E-step runs forward-backward over each word's
   segmentation lattice to collect EXPECTED piece counts (soft EM —
   the SentencePiece E-step); the M-step re-normalizes piece
   probabilities from those counts.
3. Prune: drop the lowest-probability multi-char pieces (keep_ratio
   per round — the reference implementation ranks by loss-if-removed;
   probability rank is the documented simplification) until the
   vocabulary reaches vocab_size, then run a final EM round.
4. Inference: Viterbi segmentation under the trained piece log-probs
   (ties prefer the longer final piece, then lexicographic — pinned
   for determinism; characters absent from the vocab surface as UNK).

Spark-first scale shape (the `llmops/bpe.py` bounded-sample pattern):
the corpus-sized pass is ONE word-frequency groupBy; training then
operates on a TOP-K word histogram collected to the driver — bounded
by construction (K is conf-sized, the same documented driver-side
bound as the IVF codebooks and BPE sampler). Application is a
mapInPandas pass with the vocab-sized piece table broadcast in the
closure — Arrow batches, per-batch memoization, zero shuffles.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK = "<unk>"


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — lowercase alpha-run words, the one corpus pass
    (same tokenization as bpetrain.word_freqs)."""
    w = F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("word")
    return (
        docs.select(w)
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def seed_vocab(
    words: list[tuple[str, int]], seed_size: int, max_len: int
) -> dict[str, float]:
    """Candidate pieces scored freq x len; all single chars kept."""
    scores: dict[str, int] = {}
    chars: set[str] = set()
    for word, freq in words:
        chars.update(word)
        for i in range(len(word)):
            for j in range(i + 1, min(i + max_len, len(word)) + 1):
                piece = word[i:j]
                scores[piece] = scores.get(piece, 0) + freq * (j - i)
    multi = sorted(
        ((p, s) for p, s in scores.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(seed_size - len(chars), 0)]
    seed = {c: float(scores.get(c, 1)) for c in chars}
    seed.update({p: float(s) for p, s in multi})
    total = sum(seed.values())
    return {p: math.log(s / total) for p, s in seed.items()}


def _e_step(
    words: list[tuple[str, int]], logp: dict[str, float], max_len: int
) -> tuple[dict[str, float], float]:
    """Forward-backward expected piece counts + corpus log-likelihood."""
    counts: dict[str, float] = {}
    ll = 0.0
    for word, freq in words:
        n = len(word)
        fwd = [-math.inf] * (n + 1)
        fwd[0] = 0.0
        arcs: list[list[tuple[int, str, float]]] = [[] for _ in range(n + 1)]
        for i in range(n):
            if fwd[i] == -math.inf:
                continue
            for j in range(i + 1, min(i + max_len, n) + 1):
                lp = logp.get(word[i:j])
                if lp is None:
                    continue
                arcs[j].append((i, word[i:j], lp))
                cand = fwd[i] + lp
                fwd[j] = cand if fwd[j] == -math.inf else (
                    max(fwd[j], cand) + math.log1p(
                        math.exp(-abs(fwd[j] - cand))
                    )
                )
        if fwd[n] == -math.inf:
            continue  # uncoverable word (char missing): skip in EM
        bwd = [-math.inf] * (n + 1)
        bwd[n] = 0.0
        for j in range(n, 0, -1):
            if bwd[j] == -math.inf:
                continue
            for i, piece, lp in arcs[j]:
                cand = bwd[j] + lp
                bwd[i] = cand if bwd[i] == -math.inf else (
                    max(bwd[i], cand) + math.log1p(
                        math.exp(-abs(bwd[i] - cand))
                    )
                )
        ll += freq * fwd[n]
        for j in range(1, n + 1):
            for i, piece, lp in arcs[j]:
                if fwd[i] == -math.inf or bwd[j] == -math.inf:
                    continue
                gamma = math.exp(fwd[i] + lp + bwd[j] - fwd[n])
                counts[piece] = counts.get(piece, 0.0) + freq * gamma
    return counts, ll


def _m_step(counts: dict[str, float], vocab: dict[str, float]) -> dict:
    total = sum(counts.values())
    floor = math.log(0.5 / total) if total > 0 else -20.0
    return {
        p: (
            math.log(counts[p] / total)
            if counts.get(p, 0.0) > 0
            else floor  # unused piece: floored, prunable next round
        )
        for p in vocab
    }


def train(
    words: list[tuple[str, int]],
    vocab_size: int,
    *,
    seed_size: int = 4000,
    max_len: int = 8,
    keep_ratio: float = 0.75,
    em_iters: int = 2,
) -> dict[str, float]:
    """EM-train then prune to vocab_size; returns piece -> logprob."""
    logp = seed_vocab(words, seed_size, max_len)
    while True:
        for _ in range(em_iters):
            counts, _ = _e_step(words, logp, max_len)
            logp = _m_step(counts, logp)
        multi = [(p, lp) for p, lp in logp.items() if len(p) > 1]
        n_single = len(logp) - len(multi)
        if len(logp) <= vocab_size or not multi:
            break  # single chars are never pruned (coverage floor)
        target_multi = max(vocab_size - n_single, 0)
        keep = max(int(len(multi) * keep_ratio), target_multi)
        if keep >= len(multi):
            keep = target_multi
        multi.sort(key=lambda kv: (-kv[1], kv[0]))
        logp = {p: lp for p, lp in logp.items() if len(p) == 1}
        logp.update(dict(multi[:keep]))
    counts, _ = _e_step(words, logp, max_len)
    return _m_step(counts, logp)


def viterbi(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation; ties prefer the longer final piece then the
    lexicographically smaller one. Uncovered characters emit UNK."""
    n = len(word)
    best = [(-math.inf, -1, "")] * (n + 1)
    best[0] = (0.0, -1, "")
    for j in range(1, n + 1):
        cands = []
        for i in range(max(j - max_len, 0), j):
            if best[i][0] == -math.inf:
                continue
            lp = logp.get(word[i:j])
            if lp is not None:
                cands.append((best[i][0] + lp, i, word[i:j]))
        if cands:
            # tie policy: max score, then smallest i (longest final
            # piece), then the lexicographically smaller piece
            best[j] = sorted(cands, key=lambda c: (-c[0], c[1], c[2]))[0]
    if best[n][0] == -math.inf:
        # fall back char-by-char, UNK for uncovered chars
        return [c if c in logp else UNK for c in word]
    out: list[str] = []
    j = n
    while j > 0:
        _, i, piece = best[j]
        out.append(piece)
        j = i
    return out[::-1]


def segment_docs(
    docs: DataFrame,
    logp: dict[str, float],
    *,
    max_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc segmentation stats via one Arrow pass (vocab broadcast
    in the closure, per-batch word memoization)."""

    def run(batches) -> Iterator:
        import pandas as pd
        import re

        cache: dict[str, list[str]] = {}
        splitter = re.compile("[^a-z]+")
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                n_pieces = n_unk = n_words = 0
                piece_chars = 0
                for w in splitter.split((text or "").lower()):
                    if not w:
                        continue
                    n_words += 1
                    seg = cache.get(w)
                    if seg is None:
                        seg = viterbi(w, logp, max_len)
                        cache[w] = seg
                    n_pieces += len(seg)
                    n_unk += sum(1 for p in seg if p == UNK)
                    piece_chars += sum(len(p) for p in seg if p != UNK)
                rows.append((did, n_words, n_pieces, n_unk, piece_chars))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_words", "n_pieces", "n_unk", "piece_chars",
                ],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, n_words long, n_pieces long, n_unk long,"
        " piece_chars long",
    )
