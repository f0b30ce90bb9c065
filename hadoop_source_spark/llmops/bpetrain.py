"""FULLY DISTRIBUTED BPE tokenizer training: pair counting as Spark
aggregations, merge rounds as projections.

Relationship to `llmops/bpe.py` (the bounded-sample trainer): bpe.py
trains driver-side over a top-V collected word table — the
SentencePiece/GPT-2 shape, right when the vocab fits one machine and
you want thousands of merges fast. THIS module keeps the vocabulary
DISTRIBUTED through training: every pair count is a Spark partial-agg
groupBy (so each round is externally ORACLE-VERIFIABLE — the
`bpe_pair_merge` driver query checks round 1 against plain SQL, which
a driver-side merge loop cannot offer), and the word table never
collects — the regime where the deduped vocab itself exceeds driver
memory. Same split as similarity.py's brute-force vs LSH ANN pair:
two scale regimes, one semantics, cross-tested.

Public algorithm (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units"; the tokenizer-training counterpart of
the BPE-ish token COUNTING already in `llmops/textstats.py`): collapse
the corpus to a (word, freq) table, represent each word as a symbol
sequence, repeatedly count adjacent symbol pairs weighted by word
frequency, merge the most frequent pair left-to-right non-overlapping,
and record the merge order — that ordered merge list IS the tokenizer.

Spark-first scale shape: the corpus-sized pass happens ONCE (word
frequency groupBy); every training round then runs on the VOCAB-sized
table — pairs explode to vocab x avg_word_len rows, one partial-agg
groupBy finds the winner, and the merge applies as a fold
(`aggregate` HOF) inside a projection. The per-round winner is a
single row brought to the driver (bounded, one scalar per round —
the same documented pattern as IVF centroid training); everything
else stays on executors. At 100 TB the vocab table is still ~1e7
rows, so rounds are metadata-scale after the one corpus pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): lowercase, alpha-run tokenization, corpus-wide
    counts — the one corpus-sized pass."""
    w = F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("word")
    return (
        docs.select(w)
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def pair_counts(freqs: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts over a (word|symbols, freq) table.
    Accepts either raw words (string `word` column — symbols are the
    characters) or an in-training `symbols` array column. Output:
    (a, b, cnt), freq-weighted."""
    if "symbols" in freqs.columns:
        syms = F.col("symbols")
    else:
        syms = F.filter(
            F.split(F.col("word"), ""), lambda s: F.length(s) > 0
        )
    d = freqs.withColumn("__s", syms).filter(F.size("__s") >= 2)
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("__s") - 2),
        lambda i: F.struct(
            F.get("__s", i.cast("int")).alias("a"),
            F.get("__s", (i + 1).cast("int")).alias("b"),
        ),
    )
    return (
        d.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def apply_merge(freqs: DataFrame, a: str, b: str) -> DataFrame:
    """One merge applied left-to-right non-overlapping (the classic
    fold: 'aaa' under (a,a) becomes [aa, a]) — a pure projection over
    the vocab table, no shuffle."""
    if "symbols" not in freqs.columns:
        freqs = freqs.withColumn(
            "symbols",
            F.filter(F.split(F.col("word"), ""), lambda s: F.length(s) > 0),
        )
    la, lb = F.lit(a), F.lit(b)
    merged = F.aggregate(
        F.col("symbols"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, F.size(acc)) == la)
            & (s == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(la, lb))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return freqs.withColumn("symbols", merged)


def segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained merge list: tokenize each document the same way
    `word_freqs` does and split every word into BPE pieces by
    repeatedly merging the LOWEST-RANK applicable pair (standard BPE
    inference — merge priority is training order, not greedy length).

    The per-word merge loop is inherently sequential, so this is the
    engine's documented Pandas-UDF seam: an Arrow-batched mapInPandas
    with the (broadcast-small) rank table in closure, word-level
    memoized per batch. Adds n_words, n_pieces, pieces_per_word
    (fertility — the tokenizer-quality metric), first_pieces (first 8
    pieces, for inspection)."""
    import re

    # accept train()'s (a, b, count) triples or bare (a, b) pairs
    merges = [(m[0], m[1]) for m in merges]
    ranks = {pair: i for i, pair in enumerate(merges)}
    word_re = re.compile(r"[a-z]+")

    def enc(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word)
        while len(syms) > 1:
            # standard BPE inference: best-ranked pair, then merge ALL
            # its occurrences left-to-right non-overlapping, repeat
            best = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            a, b = merges[best]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = syms
        return syms

    schema = (
        "doc_id long, n_words long, n_pieces long,"
        " pieces_per_word double, first_pieces array<string>"
    )

    def run(batches):
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                words = word_re.findall((text or "").lower())
                pieces = []
                for w in words:
                    pieces.extend(enc(w, cache))
                n_w, n_p = len(words), len(pieces)
                rows.append(
                    (
                        doc_id,
                        n_w,
                        n_p,
                        round(n_p / n_w, 4) if n_w else 0.0,
                        pieces[:8],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_words", "n_pieces", "pieces_per_word",
                    "first_pieces",
                ],
            )

    return docs.select("doc_id", text_col).mapInPandas(run, schema)


def train(
    freqs: DataFrame, n_merges: int, min_count: int = 1
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Run `n_merges` rounds; returns (ordered merge list [(a, b,
    count)], final symbolized vocab table). Ties break (count desc,
    a asc, b asc) so training is deterministic. Stops early when no
    pair reaches `min_count`. Each round localCheckpoints the vocab
    projection so the plan doesn't grow linearly with rounds."""
    if "symbols" not in freqs.columns:
        freqs = freqs.withColumn(
            "symbols",
            F.filter(F.split(F.col("word"), ""), lambda s: F.length(s) > 0),
        )
    freqs = freqs.localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(freqs)
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0].cnt < min_count:
            break
        a, b, cnt = top[0].a, top[0].b, top[0].cnt
        merges.append((a, b, cnt))
        freqs = apply_merge(freqs, a, b).localCheckpoint(eager=False)
    return merges, freqs
