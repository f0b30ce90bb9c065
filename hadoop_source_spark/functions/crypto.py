"""Transparent encryption for binary payload columns — the engine-side
analog of HDFS encryption zones / TDE (reference:
hadoop-common/crypto/AesCtrCryptoCodec.java + JceAesCtrCryptoCodec.java,
file DEKs wrapped by a zone key via
crypto/key/KeyProviderCryptoExtension.java; HDFS attaches a FileEncryptionInfo
per file and DFSClient de/encrypts AES-CTR streams transparently).

This is a REAL AES-128 implementation (FIPS-197), vectorized with numpy
across all blocks of a batch at once: S-box/inverse tables, key expansion,
ShiftRows as a flat index permutation, MixColumns via xtime over GF(2^8)
mod 0x11B — no per-byte Python loops (the only Python-level loop is the 10
AES rounds). CTR mode turns it into a stream cipher, so encrypt == decrypt
(XOR with the keystream) and any byte length works without padding,
exactly like the reference's positioned-read-friendly CTR choice.

Key model (deterministic so results are oracle-checkable; the reference
instead draws random EDEKs from the KMS): per-file DEK/IV are derived from
the zone key and the file id with SHA-256 — the same "zone key never
touches the data, each file gets its own key" layering as
KeyProviderCryptoExtension.generateEncryptedKey.

Spark-first shape: one mapInPandas pass per direction; files are
independent, so a 100 TB encryption-zone rewrite parallelizes perfectly
with zero shuffles.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76"
    "ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d83115"
    "04c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f84"
    "53d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa8"
    "51a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d1973"
    "60814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479"
    "e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a"
    "703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df"
    "8ca1890dbfe6426841992d0fb054bb16"
)

_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)

# ShiftRows on the flat column-major state (flat[4c + r] = state[r][c]):
# new[r][c] = old[r][(c + r) % 4]
_SHIFT_IDX = [4 * ((c + r) % 4) + r for c in range(4) for r in range(4)]


def _expand_key(key: bytes):
    """AES-128 key schedule -> (11, 16) uint8 round keys."""
    import numpy as np

    assert len(key) == 16
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    ks = np.array(w, dtype=np.uint8).reshape(11, 16)
    return ks


def _expand_keys_batch(keys):
    """AES-128 key schedules for MANY keys at once -> (N, 11, 16): the
    44-word recurrence runs as vector ops over all keys per step, not as
    a Python loop per key (which dominates when every row has its own
    derived DEK)."""
    import numpy as np

    sbox = np.frombuffer(_SBOX, dtype=np.uint8)
    n = len(keys)
    w = np.empty((n, 44, 4), dtype=np.uint8)
    w[:, :4] = np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(n, 4, 4)
    for i in range(4, 44):
        t = w[:, i - 1]
        if i % 4 == 0:
            t = sbox[np.roll(t, -1, axis=1)]
            t = t.copy()
            t[:, 0] ^= _RCON[i // 4 - 1]
        w[:, i] = w[:, i - 4] ^ t
    return w.reshape(n, 11, 16)


def _xtime(a):
    """GF(2^8) multiply-by-2 mod 0x11B (the AES polynomial), vectorized."""
    import numpy as np

    return (((a.astype(np.uint16) << 1) ^ ((a >> 7).astype(np.uint16) * 0x1B)) & 0xFF).astype(
        np.uint8
    )


def _aes128_encrypt_blocks(blocks, round_keys):
    """Encrypt an (N, 16) uint8 array of blocks under one expanded key —
    all N blocks advance through each round together."""
    import numpy as np

    sbox = np.frombuffer(_SBOX, dtype=np.uint8)
    shift = np.array(_SHIFT_IDX)
    s = blocks ^ round_keys[0]
    for rnd in range(1, 11):
        s = sbox[s]           # SubBytes
        s = s[:, shift]       # ShiftRows
        if rnd < 10:          # MixColumns (skipped in the final round)
            t = s.reshape(-1, 4, 4)  # [block, column, row]
            a0, a1, a2, a3 = t[:, :, 0], t[:, :, 1], t[:, :, 2], t[:, :, 3]
            x0, x1, x2, x3 = _xtime(a0), _xtime(a1), _xtime(a2), _xtime(a3)
            m = np.empty_like(t)
            m[:, :, 0] = x0 ^ (x1 ^ a1) ^ a2 ^ a3
            m[:, :, 1] = a0 ^ x1 ^ (x2 ^ a2) ^ a3
            m[:, :, 2] = a0 ^ a1 ^ x2 ^ (x3 ^ a3)
            m[:, :, 3] = (x0 ^ a0) ^ a1 ^ a2 ^ x3
            s = m.reshape(-1, 16)
        s = s ^ round_keys[rnd]  # AddRoundKey
    return s


def _ctr_keystream(round_keys, iv16: bytes, n_bytes: int, skip: int = 0):
    """CTR keystream bytes [skip, skip + n_bytes): AES(IV + i) blocks with
    a big-endian 128-bit counter (SP 800-38A; the reference's positioned
    reads do exactly this block-skip in AesCtrCryptoCodec.calculateIV)."""
    import numpy as np

    first_block = skip // 16
    pad = skip % 16
    n_blocks = (pad + n_bytes + 15) // 16
    base = int.from_bytes(iv16, "big") + first_block
    ctrs = (base + np.arange(n_blocks, dtype=object)) % (1 << 128)
    flat = np.frombuffer(
        b"".join(int(c).to_bytes(16, "big") for c in ctrs), dtype=np.uint8
    ).reshape(n_blocks, 16)
    ks = _aes128_encrypt_blocks(flat, round_keys)
    return ks.reshape(-1)[pad : pad + n_bytes]


def aes_ctr_transform(
    data: bytes, key: bytes, iv16: bytes, offset: int = 0
) -> bytes:
    """AES-128-CTR encrypt/decrypt (same operation) of arbitrary bytes.
    ``offset`` is the byte position of ``data`` within the file's CTR
    stream — decrypting a slice at its true offset equals slicing the
    full decryption (the random-access property HDFS TDE relies on for
    positioned reads)."""
    import numpy as np

    if not data:
        return b""
    ks = _ctr_keystream(_expand_key(key), iv16, len(data), skip=offset)
    return (np.frombuffer(data, dtype=np.uint8) ^ ks).tobytes()


def derive_dek_iv(zone_key: bytes, file_id: int) -> tuple[bytes, bytes]:
    """Per-file data-encryption key + IV from the zone key (deterministic
    analog of KeyProviderCryptoExtension.generateEncryptedKey: the zone
    key never touches data, every file gets its own DEK)."""
    fid = str(int(file_id)).encode()
    dek = hashlib.sha256(zone_key + b"/dek/" + fid).digest()[:16]
    iv = hashlib.sha256(zone_key + b"/iv/" + fid).digest()[:16]
    return dek, iv


def _ctr_counters(iv16: bytes, n_blocks: int):
    """(n_blocks, 16) uint8 counter blocks IV, IV+1, ... — vectorized
    128-bit big-endian increment (uint64 halves with carry)."""
    import numpy as np

    hi = np.uint64(int.from_bytes(iv16[:8], "big"))
    lo = np.uint64(int.from_bytes(iv16[8:], "big"))
    idx = np.arange(n_blocks, dtype=np.uint64)
    with np.errstate(over="ignore"):
        lo_i = lo + idx          # wraps mod 2^64, which is the carry case
        carry = (lo_i < lo).astype(np.uint64)
        hi_i = hi + carry
    out = np.empty((n_blocks, 2), dtype=">u8")
    out[:, 0] = hi_i
    out[:, 1] = lo_i
    return out.view(np.uint8).reshape(n_blocks, 16)


def _ctr_batch(keys, ivs, datas):
    """AES-128-CTR over MANY payloads at once: every payload's counter
    blocks are stacked into ONE matrix and pushed through the 10 AES
    rounds together — SubBytes/ShiftRows/MixColumns are key-independent,
    and AddRoundKey uses each block's own expanded key (np.repeat). This
    is the difference between ~ms per row (per-row numpy dispatch) and
    amortized vector throughput across the whole Arrow batch."""
    import numpy as np

    n_blocks = [(len(d) + 15) // 16 for d in datas]
    total = sum(n_blocks)
    if total == 0:
        return [b"" for _ in datas]
    ctrs = np.empty((total, 16), dtype=np.uint8)
    rks = np.empty((total, 11, 16), dtype=np.uint8)
    all_rks = _expand_keys_batch(keys)
    pos = 0
    for row, (iv, nb) in enumerate(zip(ivs, n_blocks)):
        if nb == 0:
            continue
        ctrs[pos : pos + nb] = _ctr_counters(iv, nb)
        rks[pos : pos + nb] = all_rks[row]
        pos += nb
    sbox = np.frombuffer(_SBOX, dtype=np.uint8)
    shift = np.array(_SHIFT_IDX)
    s = ctrs ^ rks[:, 0]
    for rnd in range(1, 11):
        s = sbox[s]
        s = s[:, shift]
        if rnd < 10:
            t = s.reshape(-1, 4, 4)
            a0, a1, a2, a3 = t[:, :, 0], t[:, :, 1], t[:, :, 2], t[:, :, 3]
            x0, x1, x2, x3 = _xtime(a0), _xtime(a1), _xtime(a2), _xtime(a3)
            m = np.empty_like(t)
            m[:, :, 0] = x0 ^ (x1 ^ a1) ^ a2 ^ a3
            m[:, :, 1] = a0 ^ x1 ^ (x2 ^ a2) ^ a3
            m[:, :, 2] = a0 ^ a1 ^ x2 ^ (x3 ^ a3)
            m[:, :, 3] = (x0 ^ a0) ^ a1 ^ a2 ^ x3
            s = m.reshape(-1, 16)
        s = s ^ rks[:, rnd]
    flat = s.reshape(-1)
    out = []
    pos = 0
    for d, nb in zip(datas, n_blocks):
        if not d:
            out.append(b"")
        else:
            ks = flat[pos * 16 : pos * 16 + len(d)]
            out.append((np.frombuffer(d, dtype=np.uint8) ^ ks).tobytes())
        pos += nb
    return out


def _zone_kernel(id_col: str, payload_col: str, out_col: str, zone_key: bytes):
    def run(batches):
        import pandas as pd

        for pdf in batches:
            keys, ivs, datas = [], [], []
            for fid, payload in zip(pdf[id_col], pdf[payload_col]):
                dek, iv = derive_dek_iv(zone_key, int(fid))
                keys.append(dek)
                ivs.append(iv)
                datas.append(b"" if payload is None else bytes(payload))
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: _ctr_batch(keys, ivs, datas)}
            )

    run.__annotations__ = {}
    return run


def encrypt_zone(
    df: DataFrame,
    id_col: str = "file_id",
    payload_col: str = "payload",
    zone_key: bytes = b"zone-master-key",
    out_col: str = "ciphertext",
) -> DataFrame:
    """Encrypt every file payload under its derived per-file DEK
    (CTR ciphertext has exactly the plaintext's length)."""
    return df.select(id_col, payload_col).mapInPandas(
        _zone_kernel(id_col, payload_col, out_col, zone_key),
        f"{id_col} long, {out_col} binary",
    )


def decrypt_zone(
    df: DataFrame,
    id_col: str = "file_id",
    payload_col: str = "ciphertext",
    zone_key: bytes = b"zone-master-key",
    out_col: str = "plaintext",
) -> DataFrame:
    """Inverse of :func:`encrypt_zone` (CTR: the same transform)."""
    return df.select(id_col, payload_col).mapInPandas(
        _zone_kernel(id_col, payload_col, out_col, zone_key),
        f"{id_col} long, {out_col} binary",
    )
