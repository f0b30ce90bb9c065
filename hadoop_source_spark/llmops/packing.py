"""Training-sequence assembly: tokenize documents and pack the token
streams into fixed-length sequences.

The last mile of a training-data pipeline: after dedup/quality/sampling,
documents become (doc_id, tokens) and then fixed-width rows an LLM
trainer consumes. The packer is the part Spark's built-ins can't express
(stateful accumulation across rows), so it is an Arrow-batched
mapInPandas kernel — per-partition greedy packing, embarrassingly
parallel, zero shuffles beyond whatever partitioning the caller chose.

Scale shape: each partition packs independently and emits at most one
partially-filled trailing sequence, so padding waste from
parallelization is bounded by num_partitions × seq_len tokens — noise at
100 TB (repartition the doc stream to taste first; a `repartition(N)` on
the ingest side also load-balances doc length skew). Sequence ids are
(partition, local index) pairs fused into one long, unique without any
global coordination.

Tokenization here is the deterministic stand-in a container without a
real BPE vocabulary can verify: split with the public GPT-2 pre-tokenizer
regex (textstats.BPE_SPLIT_REGEX), map each piece to a stable id by
hashing into the vocab range. The packer is tokenizer-agnostic — feed it
any (id, array<int>) table.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_source_spark.llmops.textstats import BPE_SPLIT_REGEX


def tokenize(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50257,
) -> DataFrame:
    """(id, tokens array<int>): BPE-piece split + hash-to-vocab ids.
    Pure built-ins — regexp_extract_all then a linear transform; the
    pmod(xxhash64) keeps ids in [0, vocab_size) deterministically."""
    pieces = F.regexp_extract_all(text_col, F.lit(BPE_SPLIT_REGEX), F.lit(0))
    return df.select(
        F.col(id_col),
        F.transform(
            pieces,
            lambda p: F.pmod(F.xxhash64(p), F.lit(vocab_size)).cast("int"),
        ).alias("tokens"),
    )


def pack_sequences(
    tokens_df: DataFrame,
    seq_len: int = 512,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    eod_id: int | None = None,
    pad_id: int = 0,
) -> DataFrame:
    """Greedy in-order packing of token streams into seq_len-wide rows.

    Documents are concatenated in partition order (append ``eod_id``
    after each when given), split at seq_len boundaries — a document
    longer than the remaining room continues into the next sequence, so
    NO tokens are dropped and none duplicated. The final sequence per
    partition is right-padded with ``pad_id``.

    Output: seq_id long (unique: partition_id << 32 | local index),
    input_ids array<int> (exactly seq_len wide), n_tokens int (real
    tokens, excluding padding), doc_ids array<long> (documents
    contributing to this row, in order).
    """
    import pandas as pd

    out_schema = (
        "seq_id long, input_ids array<int>, n_tokens int, doc_ids array<long>"
    )

    def pack(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = pid << 32
        local = 0
        buf: list[int] = []
        buf_docs: list[int] = []

        def flush(pad: bool):
            nonlocal buf, buf_docs, local
            rows = []
            while len(buf) >= seq_len or (pad and buf):
                chunk, buf = buf[:seq_len], buf[seq_len:]
                n = len(chunk)
                if n < seq_len:
                    chunk = chunk + [pad_id] * (seq_len - n)
                rows.append((base + local, chunk, n, list(dict.fromkeys(buf_docs))))
                local += 1
                # docs spanning into the remainder stay attributed there
                buf_docs = buf_docs[-1:] if buf else []
            return rows

        for pdf in pdfs:
            rows = []
            for did, toks in zip(pdf[id_col], pdf[tokens_col]):
                buf.extend(int(t) for t in toks)
                if eod_id is not None:
                    buf.append(eod_id)
                buf_docs.append(int(did))
                rows.extend(flush(pad=False))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["seq_id", "input_ids", "n_tokens", "doc_ids"]
                )
        tail = flush(pad=True)
        if tail:
            yield pd.DataFrame(
                tail, columns=["seq_id", "input_ids", "n_tokens", "doc_ids"]
            )

    return tokens_df.select(id_col, tokens_col).mapInPandas(pack, out_schema)


def length_bucket_report(
    docs: DataFrame,
    len_col: str,
    id_col: str = "doc_id",
    min_bucket: int = 16,
) -> DataFrame:
    """Length-bucketed batch shaping: assign every document to the
    power-of-two bucket covering its length (floor `min_bucket`), then
    report per bucket what a pad-to-bucket-width batcher would pay —
    the standard alternative to greedy packing when sequence order
    must be preserved (public semantics: bucketing batch samplers in
    fairseq/HF; pairs with pack_sequences which trades order for ~0
    waste).

    Output per bucket: bucket_width, n_docs, total_len (real tokens),
    padded_len (n_docs * width), pad_waste, utilization (rounded 6dp).
    Pure projection + one bucket-count-sized groupBy; the bucket id is
    bit math (shiftleft of the ceil-log2), no UDF."""
    ln = F.greatest(F.col(len_col).cast("long"), F.lit(1))
    # ceil-log2 via the bit length of (len-1): width = 2^max(ceil(log2 l), log2(min))
    exp = F.ceil(F.log2(ln.cast("double")))
    width = F.greatest(
        F.pow(F.lit(2.0), exp).cast("long"), F.lit(min_bucket)
    )
    b = docs.select(
        F.col(id_col),
        ln.alias("__len"),
        width.alias("bucket_width"),
    )
    return (
        b.groupBy("bucket_width")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__len").alias("total_len"),
        )
        .select(
            "bucket_width",
            "n_docs",
            "total_len",
            (F.col("n_docs") * F.col("bucket_width")).alias("padded_len"),
            (
                F.col("n_docs") * F.col("bucket_width") - F.col("total_len")
            ).alias("pad_waste"),
            F.round(
                F.col("total_len")
                / (F.col("n_docs") * F.col("bucket_width")),
                6,
            ).alias("utilization"),
        )
    )


def concat_and_chunk(
    docs: DataFrame,
    seq_len: int,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    order_col: str = "shuffle_key",
) -> DataFrame:
    """GPT-style concat-and-chunk (the decoder-pretraining recipe, in
    contrast to pack_sequences' boundary-respecting packer): shuffle
    the documents into a deterministic order, concatenate their token
    streams with one EOD token after each document (the caller's
    n_tokens must already INCLUDE the EOD — weight = true tokens + 1),
    then slice the global stream into fixed seq_len windows. Documents
    SPAN sequence boundaries; nothing is padded and nothing is
    dropped except the final partial sequence's tail slack.

    Returns one row per (sequence, document piece): seq_id, the
    piece's position inside the sequence, the source doc, the piece's
    offset inside the doc's token stream, its length, and whether it
    carries the doc's EOD token (always the last piece of a doc).

    Scale shape: the global token offset is a TWO-LEVEL prefix sum —
    range-exchange on the shuffle key, per-partition cumsum windows
    (partition-parallel), one partition-count-sized collect for the
    broadcast offset map — never a single-partition global window.
    The boundary-crossing explode emits ceil(n/seq_len)+1 pieces per
    doc. Same plan at 10^12 documents.

    Rows with n_tokens <= 0 are dropped up front: the contract is
    "n_tokens includes the EOD token" so every real document weighs
    >= 1, and a non-positive weight would otherwise make
    sequence(first_seq, last_seq) run DESCENDING (last < first) and
    emit bogus pieces instead of erroring.
    """
    cols = [F.col(order_col), F.col(id_col)]
    ranged = (
        docs.where(F.col(n_tokens_col) > 0)
        .repartitionByRange(*cols)
        .sortWithinPartitions(*cols)
        .localCheckpoint(eager=False)
    )
    ided = ranged.select(
        "*", F.monotonically_increasing_id().alias("__mid")
    )
    pid = F.shiftrightunsigned(F.col("__mid"), 33)
    sums = {
        r["pid"]: r["s"]
        for r in ided.groupBy(pid.alias("pid"))
        .agg(F.sum(n_tokens_col).alias("s"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(sums):
        offsets[p] = acc
        acc += sums[p]
    omap = F.create_map(
        *[F.lit(x) for p, off in offsets.items() for x in (p, off)]
    )
    from pyspark.sql import Window

    in_pid = (
        Window.partitionBy(pid)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (
        F.coalesce(F.sum(n_tokens_col).over(in_pid), F.lit(0))
        + omap[pid]
    ).cast("long")
    spanned = ided.select(
        id_col,
        F.col(n_tokens_col).cast("long").alias("__n"),
        start.alias("__start"),
    )
    L = F.lit(seq_len).cast("long")
    first_seq = F.floor(F.col("__start") / L).cast("long")
    last_seq = F.floor((F.col("__start") + F.col("__n") - 1) / L).cast(
        "long"
    )
    pieces = spanned.select(
        id_col,
        "__n",
        "__start",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    g_start = F.greatest(F.col("__start"), F.col("seq_id") * L)
    g_end = F.least(
        F.col("__start") + F.col("__n"), (F.col("seq_id") + 1) * L
    )
    return pieces.select(
        "seq_id",
        id_col,
        (g_start - F.col("seq_id") * L).cast("long").alias("seq_pos"),
        (g_start - F.col("__start")).cast("long").alias("piece_start"),
        (g_end - g_start).cast("long").alias("piece_len"),
        (g_end == F.col("__start") + F.col("__n")).alias("has_eod"),
    )
