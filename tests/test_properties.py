"""Property-based and edge-case gates for the round-4 operator batch —
the reference's own test strategy (SURVEY §5) leans on randomized
round-trips; hypothesis drives the same discipline here.

Kernel-level properties run WITHOUT Spark (pure numpy/python kernels)
so hypothesis can afford many examples; Spark-level edge cases (empty
inputs, degenerate groups) run one example each."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


# ------------------------------------------------------------ kernels


@given(
    st.lists(
        st.binary(min_size=0, max_size=64), min_size=2, max_size=6
    ),
    st.integers(min_value=0, max_value=5),
)
@settings(max_examples=60, deadline=None)
def test_xor_parity_recovers_any_block(blocks, lost_idx):
    """XOR(k,1): for any stripe of variable-length payloads, any single
    lost data block is recoverable from survivors + parity (zero-padded
    algebra, trimmed by true length)."""
    import numpy as np

    lost_idx = lost_idx % len(blocks)
    width = max((len(b) for b in blocks), default=0)

    def pad(b):
        a = np.zeros(width, dtype=np.uint8)
        a[: len(b)] = np.frombuffer(b, dtype=np.uint8)
        return a

    if width == 0:
        return
    parity = np.zeros(width, dtype=np.uint8)
    for b in blocks:
        parity ^= pad(b)
    rebuilt = parity.copy()
    for i, b in enumerate(blocks):
        if i != lost_idx:
            rebuilt ^= pad(b)
    assert rebuilt[: len(blocks[lost_idx])].tobytes() == blocks[lost_idx]


@given(
    st.integers(min_value=0, max_value=(1 << 16) - 1),
    st.integers(min_value=0, max_value=(1 << 16) - 1),
)
@settings(max_examples=200, deadline=None)
def test_z_interleave_bijective_and_monotone_per_dim(x, y):
    """Morton interleave: exactly invertible (bijection), and monotone
    along each dimension when the other is fixed."""

    def z(a, b):
        out = 0
        for i in range(16):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    v = z(x, y)
    xi = sum(((v >> (2 * i)) & 1) << i for i in range(16))
    yi = sum(((v >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (xi, yi) == (x, y)
    if x < (1 << 16) - 1:
        assert z(x + 1, y) > z(x, y) - (1 << 32)  # stays in range
    assert z(x, y) < 1 << 32


@given(st.lists(st.text(alphabet="abcd ", min_size=1, max_size=40), max_size=8))
@settings(max_examples=40, deadline=None)
def test_png_round_trip_random_rasters(texts):
    """PNG encode→decode is identity for arbitrary small rasters (the
    text strategy just seeds deterministic pixel noise)."""
    import numpy as np

    from hadoop_source_spark.llmops import imagecodec as ic

    seed = abs(hash(tuple(texts))) % (2**31)
    rng = np.random.RandomState(seed)
    h, w = int(rng.randint(1, 9)), int(rng.randint(1, 9))
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    assert (ic.decode_png(ic.encode_png(img)) == img).all()


@given(
    st.lists(st.integers(min_value=-(10**9), max_value=10**9),
             min_size=1, max_size=200)
)
@settings(max_examples=50, deadline=None)
def test_cms_arithmetic_hash_stays_ansi_safe(keys):
    """The CMS row hash must stay far inside int64 for ANY int key and
    seed (the ANSI-overflow trap the verify notes warn about), and slots
    stay in [0, w)."""
    P, STEP, KNUTH, W = 1_000_003, 7_961, 2_654_435_761, 256
    for k in keys:
        for s in range(3):
            pre = (k % P + P) % P + s * STEP + 17
            prod = pre * KNUTH
            assert abs(prod) < (1 << 62)
            assert 0 <= prod % W < W


# ------------------------------------------------- Spark edge cases


def test_operators_tolerate_empty_inputs(spark):
    """Empty frames flow through the new operators without crashing and
    produce empty (or correctly degenerate) results."""
    from pyspark.sql import functions as F

    from hadoop_source_spark.llmops import textstats as ts
    from hadoop_source_spark.operators import distcp, timeseries as tsr
    from hadoop_source_spark.operators import balancer, fsck
    from hadoop_source_spark.functions import cms

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert ts.repetition_stats(empty_docs).count() == 0
    assert ts.boilerplate_ngrams(empty_docs).count() == 0
    assert ts.perplexity_score(empty_docs, empty_docs).count() == 0

    empty_ev = spark.createDataFrame(
        [], "series string, ts timestamp, value double"
    )
    assert tsr.resample_gapfill(empty_ev, "ts", "series", "value").count() == 0

    empty_tree = spark.createDataFrame([], "path string, bytes long")
    assert distcp.sync_plan(empty_tree, empty_tree).count() == 0
    one_side = spark.createDataFrame([("p", 3)], ["path", "bytes"])
    plan = {r.path: r.op for r in distcp.sync_plan(one_side, empty_tree).collect()}
    assert plan == {"p": "COPY"}

    empty_files = spark.createDataFrame(
        [], "dir string, bytes long, repl int, corrupt boolean, missing boolean"
    )
    assert fsck.block_health_report(
        empty_files, "dir", "bytes", "repl", "corrupt", "missing"
    ).count() == 0

    balanced = spark.createDataFrame(
        [("n1", 100), ("n2", 100)], ["node", "bytes"]
    )
    assert balancer.move_plan(balanced, "node", "bytes").count() == 0

    sketch = cms.cms_build(
        spark.createDataFrame([], "k long"), "k"
    )
    assert sketch.count() == 0
    probes = spark.createDataFrame([(5,)], "k long")
    est = cms.cms_estimate(sketch, probes, "k").collect()
    assert est[0].est == 0  # empty sketch estimates zero, not null


def test_gapfill_single_observation_series(spark):
    """A series with ONE bucket has a 1-row spine, no gaps, and both
    fills equal the observation."""
    from datetime import datetime

    from hadoop_source_spark.operators import timeseries as tsr

    df = spark.createDataFrame(
        [("solo", datetime(2024, 5, 1, 12, 30), 42.0)],
        "series string, ts timestamp, value double",
    )
    rows = tsr.resample_gapfill(df, "ts", "series", "value").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_events, r.value_locf, r.value_interp, r.is_gap) == (1, 42.0, 42.0, 0)


@given(
    k=st.integers(min_value=2, max_value=10),
    m=st.integers(min_value=1, max_value=4),
    length=st.integers(min_value=0, max_value=64),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_rs_algebra_recovers_any_loss_pattern(k, m, length, seed):
    """Reed-Solomon GF(256) algebra property (no Spark — the raw
    kernels): for random k, m, payload length (including zero-length
    blocks) and a random loss pattern of size <= m over data AND parity
    positions, inverting the survivor rows recovers every lost block
    byte-exactly."""
    import numpy as np

    from hadoop_source_spark.functions.erasure import (
        _gf_mat_inv,
        _gf_matvec_blocks,
        _rs_rows,
    )

    rng = np.random.default_rng(seed)
    rows = _rs_rows(k, m)
    data = rng.integers(0, 256, size=(k, length), dtype=np.uint8)
    coded = _gf_matvec_blocks(rows, data)  # k data rows + m parity rows
    n_lost = int(rng.integers(1, m + 1))
    lost = sorted(rng.choice(k + m, size=n_lost, replace=False).tolist())
    survive = [i for i in range(k + m) if i not in lost][:k]
    inv = _gf_mat_inv(rows[survive])
    recovered_data = _gf_matvec_blocks(inv, coded[survive])
    assert np.array_equal(recovered_data, data)
    # lost parity re-encodes identically from the recovered data
    for li in lost:
        if li >= k:
            re = _gf_matvec_blocks(rows[li : li + 1], recovered_data)[0]
            assert np.array_equal(re, coded[li])


@given(
    data=st.binary(min_size=0, max_size=300),
    key=st.binary(min_size=16, max_size=16),
    iv=st.binary(min_size=16, max_size=16),
    lo=st.integers(min_value=0, max_value=300),
    hi=st.integers(min_value=0, max_value=300),
)
@settings(max_examples=50, deadline=None)
def test_aes_ctr_properties(data, key, iv, lo, hi):
    """AES-CTR stream properties (no Spark): involution, length
    preservation, and the positioned-read law — decrypting any slice at
    its true stream offset equals slicing the full decryption (the
    property HDFS TDE positioned reads depend on)."""
    from hadoop_source_spark.functions.crypto import aes_ctr_transform

    ct = aes_ctr_transform(data, key, iv)
    assert len(ct) == len(data)
    assert aes_ctr_transform(ct, key, iv) == data
    a, b = sorted((min(lo, len(data)), min(hi, len(data))))
    assert aes_ctr_transform(ct[a:b], key, iv, offset=a) == data[a:b]


# -------------------------------------------------- Spark-level edges


def test_capacity_allocation_random_conservation(spark):
    """capacity.allocate conservation under randomized demands/queue
    shares (one Spark run, many seeds driver-side): total <= cluster,
    per-queue totals <= elastic max, every app within [0, demand] —
    the invariants that make a scheduler a scheduler."""
    import random

    from hadoop_source_spark.operators import capacity

    rng = random.Random(17)
    for _ in range(3):
        n_q = rng.randint(2, 5)
        # valid scheduler config: guaranteed shares sum to <= 1 (the
        # operator rejects oversubscribed configs, as the RM does)
        raw = [rng.uniform(0.05, 0.3) for _ in range(n_q)]
        scale = min(1.0, 0.95 / sum(raw))
        caps = [c * scale for c in raw]
        queues = spark.createDataFrame(
            [
                (f"q{i}", caps[i], min(1.0, caps[i] + rng.uniform(0.0, 0.3)))
                for i in range(n_q)
            ],
            "queue string, cap_pct double, max_pct double",
        )
        apps = spark.createDataFrame(
            [
                (i, f"q{rng.randrange(n_q)}", rng.randint(1, 400))
                for i in range(40)
            ],
            "app_id long, queue string, demand long",
        )
        total = rng.randint(500, 4000)
        rows = capacity.allocate(apps, queues, total).collect()
        assert sum(r.total_alloc for r in rows) <= total
        qmax = {
            r.queue: int(total * r.max_pct) for r in queues.collect()
        }
        per_q: dict[str, int] = {}
        for r in rows:
            assert 0 <= r.total_alloc <= r.demand
            per_q[r.queue] = per_q.get(r.queue, 0) + r.total_alloc
        for q, used in per_q.items():
            assert used <= qmax[q], (q, used, qmax[q])


def test_placement_invariants_random_topologies(spark):
    """plan_replicas policy invariants hold on randomized topologies
    (node/rack counts vary): distinct nodes, rack-spread contract,
    writer-local first replica."""
    import random

    from pyspark.sql import functions as F

    from hadoop_source_spark.operators import placement

    rng = random.Random(23)
    for _ in range(3):
        n_nodes = rng.randint(4, 20)
        n_racks = rng.randint(2, max(2, n_nodes // 2))
        topo = spark.createDataFrame(
            [(f"n{i}", i, f"r{i % n_racks}") for i in range(n_nodes)],
            "node string, node_id long, rack string",
        )
        blocks = spark.createDataFrame(
            [(b, f"n{rng.randrange(n_nodes)}") for b in range(80)],
            "block_id long, writer string",
        )
        writer_of = {r.block_id: r.writer for r in blocks.collect()}
        plan = placement.plan_replicas(blocks, topo).collect()
        by_block: dict[int, dict] = {}
        for r in plan:
            by_block.setdefault(r.block_id, {})[r.replica_idx] = (r.node, r.rack)
        for bid, reps in by_block.items():
            assert set(reps) == {1, 2, 3}
            nodes = [reps[i][0] for i in (1, 2, 3)]
            racks = [reps[i][1] for i in (1, 2, 3)]
            assert len(set(nodes)) == 3
            assert reps[1][0] == writer_of[bid]
            assert racks[1] != racks[0] and racks[2] == racks[1]


def test_capacity_rejects_oversubscribed_config(spark):
    """Guaranteed shares summing over 100% are an invalid scheduler
    config (the RM refuses the refresh); allocate must raise, not
    silently over-allocate."""
    import pytest

    from hadoop_source_spark.operators import capacity

    queues = spark.createDataFrame(
        [("q0", 0.7, 0.8), ("q1", 0.6, 0.9)],
        "queue string, cap_pct double, max_pct double",
    )
    apps = spark.createDataFrame(
        [(1, "q0", 10)], "app_id long, queue string, demand long"
    )
    with pytest.raises(ValueError, match="oversubscribe"):
        capacity.allocate(apps, queues, 1000)
