"""T5-style span-corruption training transform (Raffel et al. 2020,
"Exploring the Limits of Transfer Learning", §3.1.4): drop contiguous
token spans from the input, replacing each with a sentinel token, and
train the model to emit the sentinels with their dropped spans — the
denoising objective behind the T5/UL2 family, complementing
`llmops/fim.py`'s decoder-style infilling split.

Deterministic closed form (the engine convention established by
fim.py: every "random" draw is an arithmetic bucket of the document
id, so the transform is reproducible and oracle-checkable):

- tokens are whitespace runs; the token stream splits into fixed
  windows of ``window`` tokens;
- window w of document d is corrupted iff ``(d + w) % 2 == 0`` AND
  its drawn start offset ``(d*31 + w*17) % window`` lands inside the
  window's actual tokens (short tails may dodge);
- the span starts at that offset with drawn length
  ``1 + (d*13 + w*7) % 3``, clamped to the window end — spans are
  disjoint by construction;
- sentinel ids reuse the WINDOW index (``<extra_id_w>``) rather than
  T5's consecutive numbering — consistent between input and target,
  and a documented simplification;
- input = tokens with each span replaced by its sentinel; target =
  each sentinel followed by its dropped tokens, in order.

Scale shape: one codegen projection built from array HOFs
(split/sequence/transform/slice/flatten) — no explode, no shuffle,
no Python; a billion documents transform map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def span_corrupt(
    docs: DataFrame,
    *,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Returns id, n_tokens, n_spans, input_text, target_text."""
    d = F.col(id_col)
    toks = F.filter(
        F.split(F.col(text_col), "\\s+"), lambda t: t != ""
    )
    n = F.size(toks)
    nw = F.floor((n + window - 1) / window).cast("int")
    windows = F.sequence(F.lit(0), nw - 1)

    def wlen(w: Column) -> Column:
        return F.least(F.lit(window), n - w * window)

    def s_off(w: Column) -> Column:
        return (d * 31 + w * 17) % window

    def span_len(w: Column) -> Column:
        return F.least(1 + (d * 13 + w * 7) % 3, wlen(w) - s_off(w))

    def corrupted(w: Column) -> Column:
        return ((d + w) % 2 == 0) & (s_off(w) < wlen(w))

    def sentinel(w: Column) -> Column:
        return F.concat(
            F.lit("<extra_id_"), w.cast("string"), F.lit(">")
        )

    def input_piece(w: Column) -> Column:
        # slice() is 1-based; window w owns tokens [w*window, w*window+wlen)
        head = F.slice(toks, w * window + 1, s_off(w))
        tail = F.slice(
            toks,
            w * window + s_off(w) + span_len(w) + 1,
            wlen(w) - s_off(w) - span_len(w),
        )
        return F.when(
            corrupted(w),
            F.concat(head, F.array(sentinel(w)), tail),
        ).otherwise(F.slice(toks, w * window + 1, wlen(w)))

    def target_piece(w: Column) -> Column:
        return F.when(
            corrupted(w),
            F.concat(
                F.array(sentinel(w)),
                F.slice(toks, w * window + s_off(w) + 1, span_len(w)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    empty = n == 0
    return docs.select(
        d.alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        F.when(
            empty, F.lit(0)
        )
        .otherwise(
            F.size(F.filter(windows, lambda w: corrupted(w)))
        )
        .cast("long")
        .alias("n_spans"),
        F.when(empty, F.lit(""))
        .otherwise(
            F.array_join(
                F.flatten(F.transform(windows, input_piece)), " "
            )
        )
        .alias("input_text"),
        F.when(empty, F.lit(""))
        .otherwise(
            F.array_join(
                F.flatten(F.transform(windows, target_piece)), " "
            )
        )
        .alias("target_text"),
    )
