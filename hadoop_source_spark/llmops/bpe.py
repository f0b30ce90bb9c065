"""BPE tokenizer training for a corpus pipeline: learn merge rules from
the corpus, then tokenize the corpus with them (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — the
classic word-frequency BPE; the same shape SentencePiece/GPT-2 trainers
use, which likewise train on a bounded sample, not the full corpus).

Scale shape, explicitly:
- TRAINING is driver-side on a BOUNDED word-frequency table (top-V words
  by count — one Spark explode + groupBy + TakeOrdered, then a pure-Python
  merge loop over vocab-sized state). This is the same documented pattern
  as the IVF coarse-quantizer training (similarity.py): the driver holds
  O(V) state, never O(corpus).
- APPLICATION is distributed: the learned merge ranks broadcast as a plain
  dict closure into ONE mapInPandas pass, with per-batch word caching
  (Zipf means a batch re-tokenizes few distinct words) — zero shuffles.

See `llmops/bpetrain.py` for the complementary FULLY DISTRIBUTED
trainer (per-round pair counting as Spark aggregations, vocab never
collected) — the regime where the deduped vocabulary itself exceeds
driver memory, at the cost of one groupBy per merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_source_spark.llmops.dedup import tokens

_EOW = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str = "text", top_v: int = 50_000
) -> list[tuple[str, int]]:
    """Top-V (word, count) pairs — the bounded training table. One
    explode + partial-agg groupBy + TakeOrderedAndProject; ties broken
    by word so training is deterministic under repartitioning."""
    rows = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.col("w"))
        .limit(top_v)
        .collect()
    )
    return [(r.w, r.n) for r in rows]


def learn_bpe(word_freqs: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table: repeat
    n_merges times {find the most frequent adjacent symbol pair weighted
    by word frequency, merge it}. Ties break lexicographically-smallest
    so the merge list is deterministic. Incremental formulation (the
    same one Sennrich's reference trainer uses): a pair→words index so a
    merge re-counts only the words containing it, and a lazy max-heap
    over pair counts — O(changed) per merge instead of O(vocab), which
    is what makes a 20k-vocab / hundreds-of-merges train sub-second.
    Pure Python on O(V) state (driver-side by design, see module doc)."""
    import heapq
    from collections import defaultdict

    words = [list(w) + [_EOW] for w, _ in word_freqs]
    freqs = [n for _, n in word_freqs]
    pairs: dict[tuple[str, str], int] = defaultdict(int)
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (sym, n) in enumerate(zip(words, freqs)):
        for p in zip(sym, sym[1:]):
            pairs[p] += n
            where[p].add(wi)
    heap = [(-c, p) for p, c in pairs.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []

    def bump(p, delta, wi):
        pairs[p] += delta
        if delta > 0:
            where[p].add(wi)
            heapq.heappush(heap, (-pairs[p], p))

    while len(merges) < n_merges and heap:
        negc, best = heapq.heappop(heap)
        c = pairs.get(best, 0)
        if c <= 0:
            continue
        if -negc != c:  # stale heap entry; reinsert at the true count
            heapq.heappush(heap, (-c, best))
            continue
        merges.append(best)
        merged = best[0] + best[1]
        for wi in list(where[best]):
            sym = words[wi]
            n = freqs[wi]
            for p in zip(sym, sym[1:]):
                pairs[p] -= n
            out = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[wi] = out
            for p in zip(out, out[1:]):
                bump(p, n, wi)
        pairs.pop(best, None)
        where.pop(best, None)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one word with learned merges: repeatedly apply the
    lowest-rank applicable merge (the standard BPE inference loop)."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with the learned merges — one mapInPandas
    pass (merge ranks ride the closure; word-level memo per batch), no
    shuffle. Returns (id, n_words, n_pieces, pieces_per_word,
    reconstruction_ok) — reconstruction_ok is the in-kernel losslessness
    self-check (pieces re-concatenate to word+EOW for EVERY word), which
    makes the iterative tokenizer hash-verifiable by a constant-TRUE
    oracle column (the est-ok pattern)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def run(batches):
        import pandas as pd

        cache: dict[str, tuple[int, bool]] = {}

        def doc_pieces(text: str) -> tuple[int, int, bool]:
            n_words = n_pieces = 0
            ok = True
            for w in _py_tokens(text):
                n_words += 1
                c = cache.get(w)
                if c is None:
                    pieces = encode_word(w, ranks)
                    c = cache[w] = (
                        len(pieces),
                        "".join(pieces) == w + _EOW,
                    )
                n_pieces += c[0]
                ok = ok and c[1]
            return n_words, n_pieces, ok

        for pdf in batches:
            nw, np_, oks = zip(*(doc_pieces(t or "") for t in pdf[text_col]))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": nw,
                    "n_pieces": np_,
                    "reconstruction_ok": oks,
                }
            )

    run.__annotations__ = {}
    return (
        df.select(id_col, text_col)
        .mapInPandas(
            run,
            f"{id_col} long, n_words long, n_pieces long, "
            "reconstruction_ok boolean",
        )
        .select(
            id_col,
            "n_words",
            "n_pieces",
            F.round(
                F.when(F.col("n_words") > 0, F.col("n_pieces") / F.col("n_words"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("pieces_per_word"),
            "reconstruction_ok",
        )
    )


def _py_tokens(text: str) -> list[str]:
    """Python mirror of dedup.tokens (lowercase \\w runs). re.ASCII
    matches Java's default \\w (Spark's split) — Python's Unicode \\w
    would otherwise tokenize CJK text differently than the JVM side."""
    import re

    return [t for t in re.split(r"[^\w]+", text.lower(), flags=re.ASCII) if t]
