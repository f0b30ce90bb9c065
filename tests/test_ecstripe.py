"""EC striped-read geometry pins (StripedBlockUtil.java:404
divideByteRangeIntoStripes steps 1-3 + prepareAllZeroChunks:602 +
getInternalBlockLength:210; recovery planning per
DFSStripedInputStream's StripeReader). Hand-computed RS(3,2)
geometry in the style of TestStripedBlockUtil."""

from __future__ import annotations

from hadoop_source_spark.operators import ecstripe

REQ_SCHEMA = (
    "req_id long, data_size long, cell_size long, data_units int,"
    " parity_units int, range_start long, range_end long"
)
LOST_SCHEMA = "req_id long, blk_idx int"


def _plan(spark, reqs, lost=None):
    out = ecstripe.plan_striped_reads(
        spark.createDataFrame(reqs, REQ_SCHEMA),
        spark.createDataFrame(lost, LOST_SCHEMA) if lost else None,
    ).collect()
    by_req: dict[int, dict] = {}
    for r in out:
        by_req.setdefault(r["req_id"], {})[
            (r["stripe_id"], r["blk_idx"])
        ] = r
    return by_req


def test_mid_range_stripe_merge_rs32(spark):
    # RS(3,2), cell=4, data_size=20 (internal lens 8/8/4, parity 8).
    # Read [5,16]: cells g=1..4; VRs blk0 [4,8) blk1 [1,5) blk2 [0,4);
    # points {0,1,4,5,8} (last-cell-end 4 already present) -> 4 stripes.
    got = _plan(spark, [(1, 20, 4, 3, 2, 5, 16)])[1]
    kinds = {key: r["kind"] for key, r in got.items()}
    assert kinds == {
        (0, 2): "DATA",
        (1, 1): "DATA", (1, 2): "DATA",
        (2, 0): "DATA", (2, 1): "DATA", (2, 2): "ALLZERO",
        (3, 0): "DATA", (3, 2): "ALLZERO",
    }
    # stripe boundaries and fetch geometry
    s0 = got[(0, 2)]
    assert (s0["stripe_off"], s0["stripe_span"]) == (0, 1)
    assert (s0["fetch_off"], s0["fetch_span"]) == (0, 1)
    s3 = got[(3, 0)]
    assert (s3["stripe_off"], s3["stripe_span"]) == (5, 3)
    assert (s3["fetch_off"], s3["fetch_span"]) == (5, 3)
    z = got[(2, 2)]
    assert (z["fetch_off"], z["fetch_span"]) == (None, 0)
    assert all(r["recoverable"] for r in got.values())


def test_recovery_prefers_data_then_parity(spark):
    # Same geometry with blk0 lost. Stripe [4,5): free inputs =
    # DATA(blk1)+ALLZERO(blk2)=2, need 1 more -> parity blk3 only.
    # Stripe [5,8): free=1 (ALLZERO blk2), need 2 -> surviving data
    # blk1 (unrequested, has bytes [5,8)) ranks before parity blk3.
    got = _plan(spark, [(1, 20, 4, 3, 2, 5, 16)], [(1, 0)])[1]
    assert got[(2, 0)]["kind"] == "DECODE_TARGET"
    assert got[(2, 3)]["kind"] == "RECOVERY_FETCH"
    assert (got[(2, 3)]["fetch_off"], got[(2, 3)]["fetch_span"]) == (4, 1)
    assert (2, 4) not in got  # second parity not needed
    assert got[(3, 0)]["kind"] == "DECODE_TARGET"
    assert got[(3, 1)]["kind"] == "RECOVERY_FETCH"
    assert (got[(3, 1)]["fetch_off"], got[(3, 1)]["fetch_span"]) == (5, 3)
    assert got[(3, 3)]["kind"] == "RECOVERY_FETCH"
    assert (3, 4) not in got
    # stripes not touching blk0 are unaffected
    assert got[(0, 2)]["kind"] == "DATA"
    assert got[(1, 1)]["kind"] == "DATA"
    assert all(r["recoverable"] for r in got.values())


def test_allzero_counts_as_decoder_input(spark):
    # data_size=14 (lens 6/4/4), read the blk0 tail [12,13]: single
    # stripe [4,6); blk1 and blk2 are past their length -> ALLZERO.
    # With blk0 lost the two known-zero chunks leave ONE parity read.
    got = _plan(spark, [(1, 14, 4, 3, 2, 12, 13)])[1]
    assert {k: r["kind"] for k, r in got.items()} == {
        (0, 0): "DATA", (0, 1): "ALLZERO", (0, 2): "ALLZERO",
    }
    got = _plan(spark, [(1, 14, 4, 3, 2, 12, 13)], [(1, 0)])[1]
    assert got[(0, 0)]["kind"] == "DECODE_TARGET"
    assert got[(0, 3)]["kind"] == "RECOVERY_FETCH"
    assert (got[(0, 3)]["fetch_off"], got[(0, 3)]["fetch_span"]) == (4, 2)
    assert (0, 4) not in got
    assert all(r["recoverable"] for r in got.values())


def test_unrecoverable_stripe_flagged(spark):
    # k=3 data blocks all lost: 0 free + 2 parity candidates < 3.
    got = _plan(
        spark, [(1, 24, 4, 3, 2, 0, 11)], [(1, 0), (1, 1), (1, 2)]
    )[1]
    targets = [k for k, r in got.items() if r["kind"] == "DECODE_TARGET"]
    assert sorted(targets) == [(0, 0), (0, 1), (0, 2)]
    fetches = [k for k, r in got.items() if r["kind"] == "RECOVERY_FETCH"]
    assert sorted(fetches) == [(0, 3), (0, 4)]
    assert not any(r["recoverable"] for r in got.values())


def test_lost_parity_is_skipped_as_candidate(spark):
    # blk0 and parity blk3 lost: stripe [0,4) needs 1 input beyond
    # DATA blk1+blk2 -> parity blk4 (blk3 unavailable).
    got = _plan(
        spark, [(1, 24, 4, 3, 2, 0, 11)], [(1, 0), (1, 3)]
    )[1]
    assert got[(0, 0)]["kind"] == "DECODE_TARGET"
    assert got[(0, 4)]["kind"] == "RECOVERY_FETCH"
    assert (0, 3) not in got
    assert all(r["recoverable"] for r in got.values())


def test_last_cell_end_point_splits_stripe(spark):
    # data_size=21, cell=4, k=3: last_cell_end = floor(5/3)*4 + 1 = 5.
    # Read [0,17]: cells g=0..4 give VRs blk0 [0,8), blk1 [0,6),
    # blk2 [0,4) -> points {0,4,6,8}; 5 strictly inside [0,8] so it
    # joins -> stripes [0,4),[4,5),[5,6),[6,8).
    got = _plan(spark, [(1, 21, 4, 3, 2, 0, 17)])[1]
    offs = sorted(
        {(r["stripe_id"], r["stripe_off"], r["stripe_span"])
         for r in got.values()}
    )
    assert offs == [(0, 0, 4), (1, 4, 1), (2, 5, 1), (3, 6, 2)]
    # internal lens (last_len=9): blk0 8, blk1 8, blk2 4+min(1,4)=5.
    # Stripe [5,6): blk2's len 5 <= 5 -> ALLZERO; stripe [4,5): blk2
    # len 5 > 4 but unrequested -> no row (plain candidate).
    assert got[(2, 2)]["kind"] == "ALLZERO"
    assert got[(3, 2)]["kind"] == "ALLZERO"
    assert (1, 2) not in got
    assert got[(2, 0)]["kind"] == "DATA"
    assert got[(2, 1)]["kind"] == "DATA"
    assert (3, 1) not in got  # blk1 vr [0,6) ends before stripe 3


def test_single_cell_partial_read(spark):
    # within one cell: [5,6] -> one cell on blk1, one stripe [1,3).
    got = _plan(spark, [(1, 24, 4, 3, 2, 5, 6)])[1]
    assert {k: r["kind"] for k, r in got.items()} == {(0, 1): "DATA"}
    r = got[(0, 1)]
    assert (r["stripe_off"], r["stripe_span"]) == (1, 2)
    assert (r["fetch_off"], r["fetch_span"]) == (1, 2)


def test_invalid_ranges(spark):
    got = _plan(
        spark,
        [(1, 24, 4, 3, 2, 11, 10),   # start > end
         (2, 24, 4, 3, 2, 0, 24),    # end == data_size
         (3, 24, 4, 3, 2, -1, 3)],   # negative start
    )
    for rid in (1, 2, 3):
        rows = list(got[rid].values())
        assert len(rows) == 1 and rows[0]["kind"] == "INVALID_RANGE"
        assert not rows[0]["recoverable"]


def test_full_stripe_read_rs63(spark):
    # RS(6,3) full-stripe-aligned read: one stripe, six DATA chunks,
    # no ALLZERO (every block full), parity untouched.
    got = _plan(spark, [(1, 6 * 4 * 5, 4, 6, 3, 24, 47)])[1]
    assert len(got) == 6
    assert all(r["kind"] == "DATA" for r in got.values())
    assert all(
        (r["stripe_off"], r["stripe_span"]) == (4, 4) for r in got.values()
    )


REPORT_SCHEMA = (
    "group_id long, blk_idx int, num_bytes long, cell_size long,"
    " data_units int, parity_units int"
)


def _recover(spark, rows):
    out = ecstripe.plan_striped_recovery(
        spark.createDataFrame(rows, REPORT_SCHEMA)
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["group_id"], {})[r["blk_idx"]] = r
    return by


def test_safe_length_kth_largest(spark):
    # RS(3,2) cell 4, lens 10/6/5/9/9: 3rd largest 9 -> safe 24,
    # newSize 8 on every index; three blocks truncate, two excluded
    got = _recover(
        spark,
        [(1, i, n, 4, 3, 2) for i, n in enumerate([10, 6, 5, 9, 9])],
    )[1]
    assert all(r["safe_length"] == 24 for r in got.values())
    assert all(r["new_size"] == 8 for r in got.values())
    acts = {i: r["action"] for i, r in got.items()}
    assert acts == {
        0: "TRUNCATE_TO_NEW_SIZE", 1: "EXCLUDED_SHORT",
        2: "EXCLUDED_SHORT", 3: "TRUNCATE_TO_NEW_SIZE",
        4: "TRUNCATE_TO_NEW_SIZE",
    }


def test_insufficient_blocks_abort(spark):
    got = _recover(spark, [(1, 0, 10, 4, 3, 2), (1, 3, 10, 4, 3, 2)])[1]
    assert all(
        r["action"] == "NO_RECOVERY_INSUFFICIENT_BLOCKS"
        and r["safe_length"] is None
        for r in got.values()
    )


def test_exactly_k_reports_all_truncate(spark):
    # pivot = the smallest report; at least k always qualify
    got = _recover(
        spark, [(1, i, n, 4, 3, 2) for i, n in enumerate([7, 4, 4])]
    )[1]
    assert all(r["safe_length"] == 12 for r in got.values())
    assert all(r["action"] == "TRUNCATE_TO_NEW_SIZE" for r in got.values())


def test_sub_cell_pivot_truncates_to_zero(spark):
    got = _recover(
        spark, [(1, i, n, 4, 3, 2) for i, n in enumerate([3, 2, 1])]
    )[1]
    assert all(r["safe_length"] == 0 for r in got.values())
    assert all(r["action"] == "TRUNCATE_TO_NEW_SIZE" for r in got.values())


def test_pivot_ties(spark):
    got = _recover(
        spark,
        [(1, i, n, 4, 3, 2) for i, n in enumerate([8, 8, 8, 8, 2])],
    )[1]
    assert got[0]["safe_length"] == 24
    assert got[4]["action"] == "EXCLUDED_SHORT"
    assert sum(
        1 for r in got.values() if r["action"] == "TRUNCATE_TO_NEW_SIZE"
    ) == 4


# --- randomized cross-check against an independent pure-Python model ---

def _py_internal_len(data_size, cell, k, idx):
    stripe = cell * k
    last = data_size % stripe
    if last == 0:
        return data_size // k
    n_stripes = (data_size - 1) // stripe + 1
    if idx < k:
        sz = max(last - idx * cell, 0)
    else:
        sz = last
    return (n_stripes - 1) * cell + min(sz, cell)


def _py_plan(data_size, cell, k, p, start, end, lost):
    """Sequential re-implementation of divideByteRangeIntoStripes +
    prepareAllZeroChunks + the recovery ranking — written against the
    Java directly, sharing no code with the Spark operator."""
    if start > end or end >= data_size or start < 0:
        return {(-1, -1): ("INVALID_RANGE", None, None, False)}
    vr = {}
    for g in range(start // cell, end // cell + 1):
        blk = g % k
        off = (g // k) * cell + (start % cell if g == start // cell else 0)
        if g == start // cell:
            size = min(cell - start % cell, end - start + 1)
        elif g == end // cell:
            size = end % cell + 1
        else:
            size = cell
        if blk in vr:
            vr[blk] = (vr[blk][0], vr[blk][1] + size)
        else:
            vr[blk] = (off, size)
    pts = sorted({q for o, s in vr.values() for q in (o, o + s)})
    lce = ((data_size // cell) // k) * cell + data_size % cell
    if pts[0] < lce < pts[-1]:
        pts = sorted(set(pts) | {lce})
    out = {}
    for si in range(len(pts) - 1):
        s_off, s_span = pts[si], pts[si + 1] - pts[si]
        kinds = {}
        for b in range(k + p):
            ib = _py_internal_len(data_size, cell, k, b)
            in_range = b in vr and vr[b][0] <= s_off < vr[b][0] + vr[b][1]
            if b < k and in_range:
                kinds[b] = "DECODE_TARGET" if b in lost else "DATA"
            elif b < k and ib <= s_off:
                kinds[b] = "ALLZERO"
        need = any(v == "DECODE_TARGET" for v in kinds.values())
        free = sum(1 for v in kinds.values() if v in ("DATA", "ALLZERO"))
        cands = [
            b for b in list(range(k)) + list(range(k, k + p))
            if b not in kinds and b not in lost
            and min(s_span, _py_internal_len(data_size, cell, k, b) - s_off)
            > 0
        ]
        recoverable = (not need) or free + len(cands) >= k
        if need:
            for b in cands[: max(k - free, 0)]:
                kinds[b] = "RECOVERY_FETCH"
        for b, kind in kinds.items():
            if kind == "DATA":
                fetch = (s_off, s_span)
            elif kind == "RECOVERY_FETCH":
                avail = min(
                    s_span, _py_internal_len(data_size, cell, k, b) - s_off
                )
                fetch = (s_off, avail)
            else:
                fetch = (None, 0)
            out[(si, b)] = (kind, s_off, s_span, fetch, recoverable)
    return out


def test_randomized_cross_check_vs_python_model(spark):
    import random

    rng = random.Random(20260815)
    reqs, losts, expected = [], [], {}
    for rid in range(1, 41):
        k, p = rng.choice([(3, 2), (6, 3)])
        cell = rng.choice([4, 8, 16])
        data_size = rng.randint(1, cell * k * 4)
        start = rng.randint(0, data_size - 1)
        end = min(start + rng.randint(0, 2 * cell * k), data_size - 1)
        lost = set(
            rng.sample(range(k + p), rng.randint(0, p))
        ) if rng.random() < 0.5 else set()
        reqs.append((rid, data_size, cell, k, p, start, end))
        losts.extend((rid, b) for b in lost)
        expected[rid] = _py_plan(data_size, cell, k, p, start, end, lost)
    got = _plan(spark, reqs, losts or None)
    for rid, exp in expected.items():
        actual = {
            (r["stripe_id"], r["blk_idx"]): (
                r["kind"], r["stripe_off"], r["stripe_span"],
                (r["fetch_off"], r["fetch_span"]), r["recoverable"],
            )
            for r in got.get(rid, {}).values()
        }
        want = {
            key: (kind, s_off, s_span, fetch, rec)
            for key, (kind, s_off, s_span, fetch, rec) in (
                (kk, vv) for kk, vv in exp.items()
            )
        } if exp and next(iter(exp))[0] != -1 else {
            (-1, -1): ("INVALID_RANGE", None, None, (None, None), False)
        }
        if (-1, -1) in want:
            assert len(actual) == 1
            assert next(iter(actual.values()))[0] == "INVALID_RANGE"
        else:
            assert actual == want, f"req {rid}"
