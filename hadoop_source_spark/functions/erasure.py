"""XOR erasure coding over binary block columns (reference:
hadoop-common/io/erasurecode/rawcoder/XORRawEncoder.java /
XORRawDecoder.java — the XOR(k,1) scheme behind HDFS EC policy
XOR-2-1-1024k; parity = bytewise XOR of the k data blocks, and any ONE
lost block is recoverable as the XOR of the survivors + parity).

Spark-first shape: blocks live in a DataFrame (stripe_id, block_idx,
payload binary). Encoding is groupBy(stripe) + an Arrow-batched numpy
XOR reduction — one shuffle keyed by stripe, partial work linear in
bytes, batched through Arrow (never per-row Python). Decoding is the
same kernel over the surviving blocks of the damaged stripes only
(filter pushes down). At 100 TB stripes are independent — the job
parallelizes by stripe hash, exactly how the reference's striped
reconstruction work distributes across datanodes."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _xor_reduce_kernel(pdf, out_idx_col_value: int, id_col: str, payload_col: str):
    import numpy as np
    import pandas as pd

    buf = None
    for p in pdf[payload_col]:
        a = np.frombuffer(bytes(p), dtype=np.uint8)
        if buf is None:
            buf = a.copy()
        elif len(a) == len(buf):
            buf ^= a
        else:  # ragged tail block: XOR over the shorter prefix, keep max len
            n = max(len(a), len(buf))
            ext = np.zeros(n, dtype=np.uint8)
            ext[: len(buf)] = buf
            ext[: len(a)] ^= a
            buf = ext
    return pd.DataFrame(
        {
            id_col: [pdf[id_col].iloc[0]],
            "block_idx": [out_idx_col_value],
            payload_col: [buf.tobytes() if buf is not None else b""],
        }
    )


def encode_parity(
    blocks: DataFrame,
    stripe_col: str = "stripe_id",
    idx_col: str = "block_idx",
    payload_col: str = "payload",
    parity_idx: int = -1,
) -> DataFrame:
    """One parity block per stripe: bytewise XOR of all data blocks.
    Returns (stripe, block_idx=parity_idx, payload)."""

    def enc(key, pdf):
        return _xor_reduce_kernel(pdf, parity_idx, stripe_col, payload_col)

    enc.__annotations__ = {}
    return blocks.select(stripe_col, idx_col, payload_col).groupBy(
        stripe_col
    ).applyInPandas(enc, f"{stripe_col} long, {idx_col} int, {payload_col} binary")


def reconstruct(
    survivors: DataFrame,
    stripe_col: str = "stripe_id",
    idx_col: str = "block_idx",
    payload_col: str = "payload",
    lost_idx_col: str = "lost_idx",
) -> DataFrame:
    """Recover one lost block per stripe from the survivors + parity:
    XOR of everything that remains. `survivors` carries the per-stripe
    lost index (constant within stripe); output is the reconstructed
    (stripe, block_idx=lost, payload)."""

    def dec(key, pdf):
        lost = int(pdf[lost_idx_col].iloc[0])
        out = _xor_reduce_kernel(pdf, lost, stripe_col, payload_col)
        if "lost_len" in pdf.columns:
            # block length lives in stripe metadata (as in the reference's
            # block headers): trim the zero-padded XOR to the true length
            n = int(pdf["lost_len"].iloc[0])
            out[payload_col] = [bytes(out[payload_col].iloc[0])[:n]]
        return out

    dec.__annotations__ = {}
    cols = [stripe_col, idx_col, payload_col, lost_idx_col]
    if "lost_len" in survivors.columns:
        cols.append("lost_len")
    return survivors.select(*cols).groupBy(stripe_col).applyInPandas(
        dec, f"{stripe_col} long, {idx_col} int, {payload_col} binary"
    )


def stripe_blocks(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    k: int = 4,
) -> DataFrame:
    """Group consecutive ids into stripes of k data blocks:
    (stripe_id = id div k, block_idx = id mod k, payload)."""
    return df.select(
        F.floor(F.col(id_col) / k).cast("long").alias("stripe_id"),
        (F.col(id_col) % k).cast("int").alias("block_idx"),
        F.col(payload_col).alias("payload"),
    )
