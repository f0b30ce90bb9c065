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


# ---------------------------------------------------------------------------
# Reed-Solomon RS(k, m) over GF(2^8) — the reference's DEFAULT EC family
# (io/erasurecode/rawcoder/RSRawEncoder.java / RSRawDecoder.java behind the
# built-in policies RS-3-2, RS-6-3, RS-10-4; GF tables per
# io/erasurecode/rawcoder/util/GF256.java). XOR above tolerates ONE loss;
# RS(k, m) tolerates any m losses. The arithmetic here is the standard
# textbook construction (Plank, "A Tutorial on Reed-Solomon Coding", 1997;
# Bloemer et al. Cauchy matrices 1995): GF(256) with the primitive
# polynomial 0x11D, parity rows from a Cauchy matrix — every square
# submatrix of a Cauchy matrix is invertible, so EVERY loss pattern of
# size <= m is decodable by one k x k inversion.
#
# Spark-first shape: identical to the XOR path — stripes are independent,
# so encode/decode are groupBy(stripe) + an Arrow-batched numpy kernel
# whose inner op is a 64 KiB table-lookup GF multiply over whole blocks
# (vectorized fancy-indexing, never per-byte Python). At 100 TB the job
# parallelizes by stripe hash exactly like the reference's striped
# reconstruction distributes across datanodes.
# ---------------------------------------------------------------------------

_GF_POLY = 0x11D  # x^8 + x^4 + x^3 + x^2 + 1, alpha=2 primitive


def _gf_tables():
    """(exp[512], log[256], mul[256][256]) numpy GF(256) tables.

    Built lazily inside the executor worker (numpy import stays off the
    module import path for driver-only uses)."""
    import numpy as np

    exp = np.zeros(512, dtype=np.uint8)
    log = np.zeros(256, dtype=np.int32)
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x <<= 1
        if x & 0x100:
            x ^= _GF_POLY
    exp[255:510] = exp[:255]
    mul = np.zeros((256, 256), dtype=np.uint8)
    nz = np.arange(1, 256)
    for s in range(1, 256):
        mul[s, 1:] = exp[log[s] + log[nz]]
    return exp, log, mul


def _cauchy_matrix(k: int, m: int):
    """m x k Cauchy parity matrix over GF(256): GM[j][i] = 1/(x_j ^ y_i)
    with x_j = j, y_i = m + i (disjoint, so x_j ^ y_i != 0). Requires
    k + m <= 256. Any square submatrix is invertible (Bloemer et al.),
    which is the whole decodability guarantee."""
    import numpy as np

    if k + m > 256:
        raise ValueError("RS over GF(256) requires k + m <= 256")
    exp, log, _ = _gf_tables()
    gm = np.zeros((m, k), dtype=np.uint8)
    for j in range(m):
        for i in range(k):
            s = j ^ (m + i)
            gm[j, i] = exp[255 - log[s]]  # gf inverse
    return gm


def _gf_mat_inv(mat):
    """Gauss-Jordan inverse of a small k x k matrix over GF(256)."""
    import numpy as np

    exp, log, mul = _gf_tables()
    n = mat.shape[0]
    a = np.concatenate(
        [mat.astype(np.uint8), np.eye(n, dtype=np.uint8)], axis=1
    )
    for col in range(n):
        piv = col + int(np.nonzero(a[col:, col])[0][0])
        if piv != col:
            a[[col, piv]] = a[[piv, col]]
        inv = exp[255 - log[a[col, col]]]
        a[col] = mul[inv][a[col]]
        for r in range(n):
            if r != col and a[r, col]:
                a[r] ^= mul[a[r, col]][a[col]]
    return a[:, n:]


def _rs_rows(k: int, m: int):
    """Full (k+m) x k coding matrix: [I_k ; Cauchy(m, k)] — systematic,
    row r < k reproduces data block r, row k+j produces parity j."""
    import numpy as np

    gm = _cauchy_matrix(k, m)
    return np.concatenate([np.eye(k, dtype=np.uint8), gm], axis=0)


def _gf_matvec_blocks(rows, blocks):
    """XOR-accumulate GF products: out[r] = XOR_i mul[rows[r,i]][blocks[i]]
    for uint8 block matrix `blocks` (n_in, L). Vectorized per coefficient:
    one 64 KiB-table fancy-index over the whole block per (r, i)."""
    import numpy as np

    _, _, mul = _gf_tables()
    n_out = rows.shape[0]
    out = np.zeros((n_out, blocks.shape[1]), dtype=np.uint8)
    for r in range(n_out):
        acc = out[r]
        for i in range(rows.shape[1]):
            c = rows[r, i]
            if c:
                acc ^= mul[c][blocks[i]]
    return out


def _stack_padded(payloads, length):
    import numpy as np

    mat = np.zeros((len(payloads), length), dtype=np.uint8)
    for i, p in enumerate(payloads):
        b = np.frombuffer(bytes(p), dtype=np.uint8)
        mat[i, : len(b)] = b
    return mat


def rs_encode(
    blocks: DataFrame,
    k: int = 4,
    m: int = 2,
    stripe_col: str = "stripe_id",
    idx_col: str = "block_idx",
    payload_col: str = "payload",
) -> DataFrame:
    """m parity blocks per stripe (block_idx = k..k+m-1), each a Cauchy
    GF(256) combination of the k data blocks zero-padded to the stripe's
    max block length (parity length == stripe max, as in the reference's
    cell-padded striped layout)."""
    gm = None  # built lazily per executor

    def enc(key, pdf):
        import pandas as pd

        nonlocal gm
        if gm is None:
            gm = _cauchy_matrix(k, m)
        pdf = pdf.sort_values(idx_col)
        length = max(len(bytes(p)) for p in pdf[payload_col])
        data = _stack_padded(list(pdf[payload_col]), length)
        parity = _gf_matvec_blocks(gm, data)
        return pd.DataFrame(
            {
                stripe_col: [pdf[stripe_col].iloc[0]] * m,
                idx_col: [k + j for j in range(m)],
                payload_col: [parity[j].tobytes() for j in range(m)],
            }
        )

    enc.__annotations__ = {}
    return blocks.select(stripe_col, idx_col, payload_col).groupBy(
        stripe_col
    ).applyInPandas(enc, f"{stripe_col} long, {idx_col} int, {payload_col} binary")


def rs_reconstruct(
    survivors: DataFrame,
    k: int = 4,
    m: int = 2,
    stripe_col: str = "stripe_id",
    idx_col: str = "block_idx",
    payload_col: str = "payload",
    lost_idx_col: str = "lost_idx",
    lost_len_col: str = "lost_len",
) -> DataFrame:
    """Recover ALL lost blocks of each damaged stripe (any pattern of
    <= m losses). `survivors` carries one row per surviving block plus
    the per-stripe lost metadata as constant columns: `lost_idx`
    (array<int>) and `lost_len` (array<int>, true byte length of each
    lost block, parity entries may be -1 = stripe max).

    Per stripe: take k surviving rows of the systematic coding matrix,
    invert once (k x k Gauss-Jordan over GF(256), ~k^3 byte ops — noise
    next to the block payloads), recover the data blocks, then re-encode
    any lost parity. Byte cost is O((k + lost) * L) table lookups."""
    rows_full = None

    def dec(key, pdf):
        import pandas as pd

        nonlocal rows_full
        if rows_full is None:
            rows_full = _rs_rows(k, m)
        pdf = pdf.sort_values(idx_col)
        lost = [int(i) for i in pdf[lost_idx_col].iloc[0]]
        lens = [int(n) for n in pdf[lost_len_col].iloc[0]]
        use = pdf.head(k)  # any k survivors suffice; take the k smallest idx
        idxs = [int(i) for i in use[idx_col]]
        length = max(len(bytes(p)) for p in use[payload_col])
        sub = rows_full[idxs]
        inv = _gf_mat_inv(sub)
        surv = _stack_padded(list(use[payload_col]), length)
        data = _gf_matvec_blocks(inv, surv)
        out_idx: list[int] = []
        out_pay: list[bytes] = []
        for li, ln in zip(lost, lens):
            if li < k:
                blk = data[li].tobytes()
            else:  # lost parity: re-encode from the recovered data
                blk = _gf_matvec_blocks(rows_full[li : li + 1], data)[
                    0
                ].tobytes()
            out_idx.append(li)
            out_pay.append(blk if ln < 0 else blk[:ln])
        return pd.DataFrame(
            {
                stripe_col: [pdf[stripe_col].iloc[0]] * len(lost),
                idx_col: out_idx,
                payload_col: out_pay,
            }
        )

    dec.__annotations__ = {}
    return survivors.select(
        stripe_col, idx_col, payload_col, lost_idx_col, lost_len_col
    ).groupBy(stripe_col).applyInPandas(
        dec, f"{stripe_col} long, {idx_col} int, {payload_col} binary"
    )
