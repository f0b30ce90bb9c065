"""Distributed composite file checksum (MD5-of-MD5s-of-chunk-digests).

Reference semantics (`hdfs-client/FileChecksumHelper.java`): HDFS's
distributed checksum is hierarchical — each datanode digests its
block's per-chunk CRCs into a block MD5 (`:449`), and the client MD5s
the concatenated block MD5s in block order into the file checksum
(`makeMd5CrcResult`, `:280-289`; `MD5Hash.digest(blockChecksumBuf)`
`:282`) — so a multi-terabyte file is checksummed without any single
machine streaming all of it; the (bytesPerCRC, crcPerBlock) layout is
part of the result type (`MD5MD5CRC32*`, `:285`) because the digest
is only comparable within one layout. A zero-length file digests the
empty block buffer (`:249`).

This engine keeps the exact hierarchy — chunk digest → block digest
(MD5 over the ordered chunk digests) → file digest (MD5 over the
ordered block digests) — with MD5 standing in for CRC32C at the chunk
tier: the composition property (what the reference is actually about)
is digest-agnostic, and MD5 exists in every SQL engine an oracle
might run on.

Spark-first: the whole tree evaluates INSIDE one projection with
nested higher-order array functions — no explode, no groupBy, no
shuffle; every row (file) digests independently and the expression is
codegen'd end to end. Same parallelism shape as the real protocol
(each block digested where it lives), one expression deep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def composite_checksum(
    text: str | Column,
    bytes_per_chunk: int = 512,
    chunks_per_block: int = 8,
) -> Column:
    """File-level composite digest of a text column, as a hex string.

    chunk digest = md5 of each `bytes_per_chunk`-char slice; block
    digest = md5 of its `chunks_per_block` concatenated hex chunk
    digests; file digest = md5 of the concatenated hex block digests.
    Character-based slicing so any engine reproduces it exactly."""
    return F.md5(
        F.concat_ws(
            "", block_digests(text, bytes_per_chunk, chunks_per_block)
        ).cast("binary")
    )


def block_digests(
    text: str | Column,
    bytes_per_chunk: int = 512,
    chunks_per_block: int = 8,
) -> Column:
    """The intermediate tier: array of per-block hex digests in block
    order (what each datanode would return), for callers that diff at
    block granularity (e.g. which block of a mutated file changed)."""
    c = F.col(text) if isinstance(text, str) else text
    bpc, cpb = bytes_per_chunk, chunks_per_block
    bpb = bpc * cpb
    n_chunks = F.ceil(F.length(c) / bpc)
    n_blocks = F.ceil(F.length(c) / bpb)

    def block_digest(b: Column) -> Column:
        cnt = F.least(F.lit(cpb), (n_chunks - b * cpb).cast("int"))
        chunks = F.transform(
            F.sequence(F.lit(0), cnt - 1),
            lambda i: F.md5(
                F.substring(
                    c, (b * bpb + i * bpc + 1).cast("int"), F.lit(bpc)
                ).cast("binary")
            ),
        )
        return F.md5(F.concat_ws("", chunks).cast("binary"))

    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), (n_blocks - 1).cast("int")), block_digest
        )
    )
