"""Bloom filter contract (no false negatives, algebra), hash dispatch,
Writable type-map round-trip."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from hadoop_source_spark.functions import bloom, hashes

M = 1 << 16
K = 5


@pytest.fixture(scope="module")
def keysets(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(500)], "key string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(500)], "key string")
    absent = spark.createDataFrame([(f"z{i}",) for i in range(2000)], "key string")
    return a, b, absent


def test_bloom_no_false_negatives(spark, keysets):
    a, _, _ = keysets
    filt = bloom.bloom_build(a, "key", M, K)
    res = bloom.bloom_probe(filt, a, "key", M, K)
    assert res.filter(~F.col("might_contain")).count() == 0


def test_bloom_false_positive_rate_bounded(spark, keysets):
    a, _, absent = keysets
    filt = bloom.bloom_build(a, "key", M, K)
    fp = bloom.bloom_probe(filt, absent, "key", M, K).filter(
        F.col("might_contain")
    ).count()
    # n=500, m=65536, k=5 → theoretical fpp ~ 2e-7; allow generous slack
    assert fp <= 2, f"false positives: {fp}/2000"


def test_bloom_or_is_union(spark, keysets):
    a, b, _ = keysets
    union_filter = bloom.bloom_or(
        bloom.bloom_build(a, "key", M, K), bloom.bloom_build(b, "key", M, K)
    )
    both = a.unionByName(b)
    res = bloom.bloom_probe(union_filter, both, "key", M, K)
    assert res.filter(~F.col("might_contain")).count() == 0


def test_bloom_and_xor_algebra(spark, keysets):
    a, b, _ = keysets
    fa, fb = (bloom.bloom_build(x, "key", M, K) for x in (a, b))
    fand = bloom.bloom_and(fa, fb)
    fxor = bloom.bloom_xor(fa, fb)
    # and-filter bits ⊆ each side's bits; xor = or minus and (wordwise)
    for_ = bloom.bloom_or(fa, fb)
    j = (
        for_.selectExpr("word_idx", "word AS w_or")
        .join(fand.selectExpr("word_idx", "word AS w_and"), "word_idx", "left")
        .join(fxor.selectExpr("word_idx", "word AS w_xor"), "word_idx", "left")
        .selectExpr(
            "coalesce(w_and, 0) & ~w_or AS and_outside_or",
            "(coalesce(w_and,0) ^ coalesce(w_xor,0)) ^ w_or AS recompose",
        )
    )
    assert j.filter("and_outside_or != 0 OR recompose != 0").count() == 0


def test_hash_dispatch(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    row = df.select(
        hashes.md5_hex("s").alias("m"),
        hashes.sha256_hex("s").alias("sh"),
        hashes.crc32("s").alias("c"),
        hashes.murmur3_32("s").alias("mm"),
        hashes.xxhash64("s").alias("xx"),
    ).collect()[0]
    assert row.m == "900150983cd24fb0d6963f7d28e17f72"
    assert row.sh.startswith("ba7816bf")
    assert row.c == 891568578
    assert isinstance(row.mm, int) and isinstance(row.xx, int)


def test_scalar_pandas_udf_surface(spark):
    """The UDF tiers (SURVEY §2.9): an Arrow-vectorized scalar pandas_udf
    must agree with the JVM expression it mirrors."""
    from tests._pandas_udfs import py_quality

    from hadoop_source_spark.data import table

    d = table(spark, "/root/testdata/sf0.001", "documents")
    jvm = d.select(
        "doc_id",
        F.round(
            F.least(
                F.size(F.split(F.trim("text"), r"\s+")) / F.lit(100.0),
                F.lit(1.0),
            ),
            6,
        ).alias("q"),
    )
    py = d.select("doc_id", F.round(py_quality("text"), 6).alias("q"))
    assert sorted(map(tuple, jvm.collect())) == sorted(map(tuple, py.collect()))


def test_table_properties_metadata(spark):
    """SequenceFile header metadata (SequenceFile.java:725 Metadata
    TreeMap) → table properties."""
    from hadoop_source_spark import io as hio
    from hadoop_source_spark.data import table

    n = table(spark, "/root/testdata/sf0.001", "nation")
    hio.write_bucketed(n, "meta_nation", "n_nationkey", 2)
    spark.sql(
        "ALTER TABLE meta_nation SET TBLPROPERTIES ('writer'='hss', 'v'='1')"
    )
    props = {
        r.key: r.value
        for r in spark.sql("SHOW TBLPROPERTIES meta_nation").collect()
    }
    assert props["writer"] == "hss" and props["v"] == "1"


def test_writable_type_map_round_trip(spark):
    """Every mapped Spark type survives a parquet round trip (the
    SequenceFile write→read-back contract, columnar edition)."""
    from pyspark.sql import types as T

    from hadoop_source_spark.types import WRITABLE_TO_SPARK

    fields = [
        T.StructField(f"c_{name.lower()}", dt, True)
        for name, dt in WRITABLE_TO_SPARK.items()
        if not isinstance(dt, T.NullType)
    ]
    schema = T.StructType(fields)
    row = []
    for f in fields:
        dt = f.dataType
        if isinstance(dt, T.BooleanType):
            row.append(True)
        elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            row.append(1)
        elif isinstance(dt, (T.FloatType, T.DoubleType)):
            row.append(1.5)
        elif isinstance(dt, T.StringType):
            row.append("s")
        elif isinstance(dt, T.BinaryType):
            row.append(bytearray(b"\x01\x02"))
        elif isinstance(dt, T.MapType):
            row.append({"k": "v"})
        elif isinstance(dt, T.ArrayType):
            row.append([["x"]] if isinstance(dt.elementType, T.ArrayType) else ["x"])
        elif isinstance(dt, T.StructType):
            row.append(("tag", bytearray(b"\x00")))
        else:
            row.append(None)
    df = spark.createDataFrame([tuple(row)], schema)
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/t")
        back = spark.read.parquet(f"{d}/t")
        assert back.schema == schema
        assert back.count() == 1


def test_approx_distinct_error_bound(spark):
    """HLL++ sketch accuracy: within a few percent of exact distinct at
    rsd=0.01 (the §2.4 sketch contract — test bounds, never equality)."""
    from hadoop_source_spark.data import table

    e = table(spark, "/root/testdata/sf0.01", "events")
    approx = {
        r.event_type: r.a
        for r in e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("a"))
        .collect()
    }
    exact = {
        r.event_type: r.x
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, x in exact.items():
        assert abs(approx[t] - x) <= max(0.05 * x, 2), (t, approx[t], x)


def test_xor_erasure_round_trip(spark):
    """XOR(k,1) erasure coding (ref XORRawEncoder/Decoder): encode one
    parity per 4-block stripe over real variable-length text payloads,
    destroy one data block per stripe, reconstruct from survivors +
    parity, and require byte-exact recovery."""
    from pyspark.sql import functions as F

    from hadoop_source_spark.data import table
    from hadoop_source_spark.functions import erasure

    docs = (
        table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", F.encode("text", "UTF-8").alias("payload"))
        .filter(F.col("doc_id") < 40)
    )
    blocks = erasure.stripe_blocks(docs, "doc_id", "payload", k=4)
    parity = erasure.encode_parity(blocks)

    # lose block (stripe_id % 4) from every stripe
    lost = blocks.select(
        "stripe_id", "block_idx", F.length("payload").alias("n")
    ).filter(F.col("block_idx") == F.col("stripe_id") % 4)
    survivors = (
        blocks.unionByName(parity)
        .join(
            lost.select(
                "stripe_id",
                F.col("block_idx").alias("lost_idx"),
                F.col("n").alias("lost_len"),
            ),
            "stripe_id",
        )
        .filter(F.col("block_idx") != F.col("lost_idx"))
    )
    rebuilt = {
        (r.stripe_id, r.block_idx): bytes(r.payload)
        for r in erasure.reconstruct(survivors).collect()
    }
    original = {
        (r.stripe_id, r.block_idx): bytes(r.payload)
        for r in blocks.join(
            lost.select("stripe_id", F.col("block_idx").alias("li")),
            "stripe_id",
        ).filter(F.col("block_idx") == F.col("li")).drop("li").collect()
    }
    assert len(original) == 10 and rebuilt == original


def test_cms_contract_and_merge(spark):
    """CMS one-sided error (never under-estimates), exactness when the
    sketch is wide enough to avoid collisions, and monoid merge ==
    sketch-of-union."""
    from pyspark.sql import functions as F

    from hadoop_source_spark.functions import cms

    a = spark.range(1000).select((F.col("id") % 10).alias("k"))
    b = spark.range(500).select((F.col("id") % 5).alias("k"))
    wide = {"width": 4096, "depth": 3}
    sa, sb = cms.cms_build(a, "k", **wide), cms.cms_build(b, "k", **wide)
    probes = a.select("k").distinct()

    est_a = {r.k: r.est for r in cms.cms_estimate(sa, probes, "k", **wide).collect()}
    assert est_a == {k: 100 for k in range(10)}  # wide sketch: exact

    merged = cms.cms_merge(sa, sb)
    est_m = {r.k: r.est for r in cms.cms_estimate(merged, probes, "k", **wide).collect()}
    union_sketch = cms.cms_build(a.unionByName(b), "k", **wide)
    est_u = {r.k: r.est for r in cms.cms_estimate(union_sketch, probes, "k", **wide).collect()}
    assert est_m == est_u
    assert est_m == {k: (200 if k < 5 else 100) for k in range(10)}

    # tight sketch: collisions may inflate but NEVER deflate
    tight = {"width": 8, "depth": 2}
    st = cms.cms_build(a, "k", **tight)
    est_t = {r.k: r.est for r in cms.cms_estimate(st, probes, "k", **tight).collect()}
    assert all(est_t[k] >= 100 for k in range(10))
    # sketch size is d*w rows regardless of input
    assert st.count() <= 8 * 2


def test_gf256_field_axioms():
    """The GF(256) tables behind RS coding are a field: exp/log inverse,
    commutative multiply, multiplicative inverses, distributivity over
    XOR (sampled), and 1 is the identity."""
    import numpy as np

    from hadoop_source_spark.functions.erasure import _gf_tables

    exp, log, mul = _gf_tables()
    # exp/log are mutually inverse on nonzero elements
    nz = np.arange(1, 256)
    assert np.array_equal(exp[log[nz]], nz.astype(np.uint8))
    # identity + zero annihilates
    assert np.array_equal(mul[1][nz], nz.astype(np.uint8))
    assert int(mul[0].sum()) == 0 and int(mul[:, 0].sum()) == 0
    # commutativity (full table)
    assert np.array_equal(mul, mul.T)
    # every nonzero element has an inverse
    inv = exp[255 - log[nz]]
    assert np.array_equal(mul[nz, inv], np.ones(255, dtype=np.uint8))
    # distributivity a*(b^c) == a*b ^ a*c on a deterministic sample
    rng = np.random.default_rng(7)
    a, b, c = (rng.integers(0, 256, 200) for _ in range(3))
    assert np.array_equal(mul[a, b ^ c], mul[a, b] ^ mul[a, c])


def test_rs_erasure_all_loss_patterns(spark):
    """RS(3,2) recovers EVERY loss pattern of size <= m byte-exactly —
    the Cauchy-matrix decodability guarantee, exercised exhaustively:
    one stripe per pattern (5 single losses + 10 double losses over the
    5 blocks, data AND parity), variable-length payloads, one encode job
    and one reconstruct job for all 15 patterns."""
    import itertools

    from hadoop_source_spark.functions import erasure

    k, m = 3, 2
    patterns = [
        list(p)
        for size in (1, 2)
        for p in itertools.combinations(range(k + m), size)
    ]
    payload = lambda s, i: (f"stripe{s}-block{i}-" * (i + 1 + s % 3)).encode()
    rows = [
        (s, i, payload(s, i)) for s in range(len(patterns)) for i in range(k)
    ]
    blocks = spark.createDataFrame(
        rows, "stripe_id long, block_idx int, payload binary"
    )
    parity = erasure.rs_encode(blocks, k=k, m=m)
    # per-stripe lost metadata: true lengths for data blocks, -1 (stripe
    # max) for parity blocks, as the reference's block headers would carry
    meta = [
        (
            s,
            patterns[s],
            [len(payload(s, i)) if i < k else -1 for i in patterns[s]],
        )
        for s in range(len(patterns))
    ]
    meta_df = spark.createDataFrame(
        meta, "stripe_id long, lost_idx array<int>, lost_len array<int>"
    )
    survivors = (
        blocks.unionByName(parity)
        .join(meta_df, "stripe_id")
        .filter(~F.expr("array_contains(lost_idx, block_idx)"))
    )
    rebuilt = {
        (r.stripe_id, r.block_idx): bytes(r.payload)
        for r in erasure.rs_reconstruct(survivors, k=k, m=m).collect()
    }
    # every lost DATA block must equal the original bytes; every lost
    # PARITY block must equal the originally encoded parity bytes
    orig_parity = {
        (r.stripe_id, r.block_idx): bytes(r.payload) for r in parity.collect()
    }
    n_checked = 0
    for s, lost, _ in meta:
        for i in lost:
            want = payload(s, i) if i < k else orig_parity[(s, i)]
            assert rebuilt[(s, i)] == want, (s, i)
            n_checked += 1
    assert n_checked == 5 * 1 + 10 * 2


def test_rs_erasure_batch_carry_and_vectorized_path(spark):
    """The batch-vectorized RS kernels (r15) must be exact when stripes
    SPAN Arrow batches: with maxRecordsPerBatch=16, many 4-block stripes
    per partition land across batch boundaries, exercising the
    carry-the-trailing-stripe path, the per-pattern bucketing, and the
    chunked slab assembly. Round-trips every block byte-exactly with a
    rotating 2-loss pattern (data and parity)."""
    import itertools

    from hadoop_source_spark.functions import erasure

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        k, m = 4, 2
        patterns = [
            list(p) for p in itertools.combinations(range(k + m), 2)
        ]
        n_stripes = 120  # 480 rows -> many 16-row batches per partition
        payload = lambda s, i: (
            f"s{s}b{i}|" * (1 + (s * 7 + i) % 5)
        ).encode()
        rows = [
            (s, i, payload(s, i))
            for s in range(n_stripes)
            for i in range(k)
        ]
        blocks = spark.createDataFrame(
            rows, "stripe_id long, block_idx int, payload binary"
        )
        parity = erasure.rs_encode(blocks, k=k, m=m)
        meta = [
            (
                s,
                patterns[s % len(patterns)],
                [
                    len(payload(s, i)) if i < k else -1
                    for i in patterns[s % len(patterns)]
                ],
            )
            for s in range(n_stripes)
        ]
        meta_df = spark.createDataFrame(
            meta, "stripe_id long, lost_idx array<int>, lost_len array<int>"
        )
        survivors = (
            blocks.unionByName(parity)
            .join(meta_df, "stripe_id")
            .filter(~F.expr("array_contains(lost_idx, block_idx)"))
        )
        rebuilt = {
            (r.stripe_id, r.block_idx): bytes(r.payload)
            for r in erasure.rs_reconstruct(survivors, k=k, m=m).collect()
        }
        orig_parity = {
            (r.stripe_id, r.block_idx): bytes(r.payload)
            for r in parity.collect()
        }
        n_checked = 0
        for s, lost, _ in meta:
            for i in lost:
                want = payload(s, i) if i < k else orig_parity[(s, i)]
                assert rebuilt[(s, i)] == want, (s, i)
                n_checked += 1
        assert n_checked == 2 * n_stripes
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )


def test_aes128_nist_vectors():
    """The AES behind encryption zones is REAL AES: FIPS-197 C.1 block
    vector, SP 800-38A F.5.1 CTR vector, involution, counter wrap, and
    the positioned-read property (slice decrypt at offset == slice of
    full decrypt, any offset alignment)."""
    import numpy as np

    from hadoop_source_spark.functions.crypto import (
        _aes128_encrypt_blocks,
        _expand_key,
        aes_ctr_transform,
    )

    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = _aes128_encrypt_blocks(
        np.frombuffer(pt, dtype=np.uint8).reshape(1, 16), _expand_key(key)
    )
    assert ct.tobytes().hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"

    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")
    pt = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172a"
        "ae2d8a571e03ac9c9eb76fac45af8e51"
        "30c81c46a35ce411e5fbc1191a0a52ef"
        "f69f2445df4f9b17ad2b417be66c3710"
    )
    want = (
        "874d6191b620e3261bef6864990db6ce"
        "9806f66b7970fdff8617187bb9fffdff"
        "5ae4df3edbd5d35e5b4f09020db03eab"
        "1e031dda2fbe03d1792170a0f3009cee"
    )
    got = aes_ctr_transform(pt, key, iv)
    assert got.hex() == want
    assert aes_ctr_transform(got, key, iv) == pt
    # counter wrap at 2^128
    c2 = aes_ctr_transform(b"x" * 40, key, b"\xff" * 16)
    assert aes_ctr_transform(c2, key, b"\xff" * 16) == b"x" * 40
    # positioned read: decrypt [21:53) directly from its stream offset
    assert aes_ctr_transform(got[21:53], key, iv, offset=21) == pt[21:53]


def test_encryption_zone_round_trip(spark):
    """encrypt_zone/decrypt_zone over real docs: byte-exact round trip,
    ciphertext never equals a non-empty plaintext, length preserved
    (CTR), per-file keys actually differ (same plaintext -> different
    ciphertext under different file ids), wrong zone key garbles."""
    from pyspark.sql import functions as F

    from hadoop_source_spark.data import table
    from hadoop_source_spark.functions import crypto

    docs = (
        table(spark, "/root/testdata/sf0.001", "documents")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    )
    enc = crypto.encrypt_zone(docs, "doc_id", "payload", b"zk-test")
    dec = crypto.decrypt_zone(enc, "doc_id", "ciphertext", b"zk-test")
    orig = {r.doc_id: bytes(r.payload) for r in docs.collect()}
    ct = {r.doc_id: bytes(r.ciphertext) for r in enc.collect()}
    back = {r.doc_id: bytes(r.plaintext) for r in dec.collect()}
    assert back == orig
    for i, p in orig.items():
        assert len(ct[i]) == len(p)
        if p:
            assert ct[i] != p
    # same plaintext under two file ids -> different ciphertexts
    twin = spark.createDataFrame(
        [(1, b"identical plaintext"), (2, b"identical plaintext")],
        "doc_id long, payload binary",
    )
    tc = {r.doc_id: bytes(r.ciphertext)
          for r in crypto.encrypt_zone(twin, "doc_id", "payload", b"zk-test").collect()}
    assert tc[1] != tc[2]
    # wrong zone key does not decrypt
    bad = crypto.decrypt_zone(enc, "doc_id", "ciphertext", b"other-key")
    garbled = {r.doc_id: bytes(r.plaintext) for r in bad.collect()}
    assert all(garbled[i] != orig[i] for i in orig if orig[i])


def test_udtf_parse_props(spark):
    """The Python UDTF surface (SURVEY §2.9): parse_props lateral-joins a
    JSON props column into (key, value) rows and must agree with the
    JVM-side from_json + explode formulation on real events data."""
    from pyspark.sql import functions as F

    from hadoop_source_spark.data import table
    from hadoop_source_spark.functions import udx

    udx.register_udtfs(spark)
    e = table(spark, "/root/testdata/sf0.001", "events").filter(
        F.col("event_id") < 500
    )
    e.select("event_id", "props").createOrReplaceTempView("__udtf_events")
    got = spark.sql(
        "SELECT event_id, p.key, p.value "
        "FROM __udtf_events, LATERAL parse_props(props) p"
    )
    want = e.select(
        "event_id",
        F.explode(
            F.from_json("props", "map<string,string>")
        ).alias("key", "value"),
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0


def test_pandas_udaf_geo_mean(spark):
    """The grouped-agg pandas UDAF surface (SURVEY §2.9): geo_mean per
    event_type equals the exact SQL identity exp(avg(ln(x))) over the
    positive values."""
    from pyspark.sql import functions as F

    from hadoop_source_spark.data import table
    from hadoop_source_spark.functions.udx import geo_mean

    e = table(spark, "/root/testdata/sf0.001", "events")
    got = {
        r.event_type: r.gm
        for r in e.groupBy("event_type").agg(geo_mean("value").alias("gm")).collect()
    }
    want = {
        r.event_type: r.gm
        for r in e.filter(F.col("value") > 0)
        .groupBy("event_type")
        .agg(F.exp(F.avg(F.log("value"))).alias("gm"))
        .collect()
    }
    assert set(got) >= set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9 * max(1.0, abs(v)), k


def test_hll_sketch_store_merge_and_rollup(spark):
    """HLL sketch store (functions/hll): per-day sketches estimate
    within the HLL bound; rolling up the store (union of sketches)
    equals sketching the union; incremental day-by-day merge_stores
    equals the store built from all rows at once; estimates never
    require rescanning raw data."""
    from pyspark.sql import functions as F

    from hadoop_source_spark.data import table
    from hadoop_source_spark.functions import hll

    # sf0.001 (r15): the incremental day-by-day merge chain below builds
    # one store per day — at sf0.01 that was ~27 s of suite wall for the
    # same bound checks (the HLL guarantee is relative, not SF-bound).
    e = table(spark, "/root/testdata/sf0.001", "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    store = hll.sketch_store(e, ["day"], "user_id")
    est = {r.day: r.distinct_est for r in hll.estimate(store, ["day"]).collect()}
    exact = {
        r.day: r.n
        for r in e.groupBy("day").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for d in exact:
        assert abs(est[d] - exact[d]) <= max(3, 0.05 * exact[d]), d

    total_exact = e.agg(F.countDistinct("user_id")).collect()[0][0]
    total_est = hll.rollup_estimate(store, []).collect()[0].distinct_est
    assert abs(total_est - total_exact) <= max(3, 0.05 * total_exact)

    # incremental maintenance == batch build
    days = sorted(exact)
    inc = hll.sketch_store(e.filter(F.col("day") == days[0]), ["day"], "user_id")
    for d in days[1:]:
        inc = hll.merge_stores(
            inc, hll.sketch_store(e.filter(F.col("day") == d), ["day"], "user_id"),
            ["day"],
        )
    inc_est = {r.day: r.distinct_est for r in hll.estimate(inc, ["day"]).collect()}
    assert inc_est == est
    n_inc = {r.day: r.n_rows for r in inc.select("day", "n_rows").collect()}
    n_full = {r.day: r.n_rows for r in store.select("day", "n_rows").collect()}
    assert n_inc == n_full


def test_kll_store_merge_rollup_rank_guarantee(spark):
    """KLL quantile store (functions/kll): sketch quantiles honor the
    rank guarantee per group; rolling up the store == sketching the
    union (same rank bound); incremental merge answers like the batch
    store."""
    from pyspark.sql import functions as F

    from hadoop_source_spark.data import table
    from hadoop_source_spark.functions import kll

    e = table(spark, "/root/testdata/sf0.01", "events").select(
        "event_type", "value"
    ).localCheckpoint(eager=True)
    store = kll.quantile_store(e, ["event_type"], "value")

    def rank_of(etype, v):
        sub = e.filter(F.col("event_type") == etype)
        n = sub.count()
        lo = sub.filter(F.col("value") < v).count() / n
        hi = sub.filter(F.col("value") <= v).count() / n
        return lo, hi

    qs = kll.quantiles(store, ["event_type"], [0.5, 0.9]).collect()
    for r in qs:
        for p, col in ((0.5, "q_0_5"), (0.9, "q_0_9")):
            lo, hi = rank_of(r.event_type, r[col])
            assert lo <= p + 0.03 and hi >= p - 0.03, (r.event_type, p)

    # rollup: merged sketch's median obeys the rank bound on ALL values
    total = kll.quantiles(kll.rollup_store(store, []), [], [0.5]).collect()[0]
    n = e.count()
    lo = e.filter(F.col("value") < total.q_0_5).count() / n
    hi = e.filter(F.col("value") <= total.q_0_5).count() / n
    assert lo <= 0.53 and hi >= 0.47

    # incremental maintenance: merge of two half-stores answers within
    # the same bound as the batch store (KLL merge keeps the guarantee);
    # rows split by value-hash parity so both halves hit every group
    a = e.filter((F.abs(F.hash("value")) % 2) == 0)
    b = e.filter((F.abs(F.hash("value")) % 2) == 1)
    inc = kll.merge_stores(
        kll.quantile_store(a, ["event_type"], "value"),
        kll.quantile_store(b, ["event_type"], "value"),
        ["event_type"],
    )
    n_inc = {r.event_type: r.n_rows for r in inc.collect()}
    n_full = {r.event_type: r.n_rows for r in store.collect()}
    assert n_inc == n_full
    for r in kll.quantiles(inc, ["event_type"], [0.5]).collect():
        lo, hi = rank_of(r.event_type, r.q_0_5)
        assert lo <= 0.53 and hi >= 0.47, r.event_type


def test_theta_store_set_algebra(spark):
    """Theta store (functions/theta): union rollup matches HLL-style
    distinct union; intersection over planted overlapping sets is exact
    below sketch capacity; difference-by-inclusion-exclusion holds."""
    from pyspark.sql import functions as F

    from hadoop_source_spark.functions import theta

    # planted sets: A = 0..999, B = 500..1499 → |A∩B| = 500, |A∪B| = 1500
    a = spark.range(0, 1000).select(F.lit("A").alias("g"), F.col("id"))
    b = spark.range(500, 1500).select(F.lit("B").alias("g"), F.col("id"))
    store = theta.sketch_store(a.unionByName(b), ["g"], "id")
    est = {r.g: r.distinct_est for r in theta.estimate(store, ["g"]).collect()}
    assert est["A"] == 1000 and est["B"] == 1000  # below 2^12: exact
    union = theta.union_rollup(store, []).collect()[0].distinct_est
    assert union == 1500
    # pairwise intersection through the store API: A's partner is B
    ov = theta.pairwise_overlap(store, "g", pair_of=F.lit("B")).filter(
        F.col("group_a") == "A"
    ).collect()
    assert [(r.group_a, r.group_b, r.overlap_est) for r in ov] == [("A", "B", 500)]
