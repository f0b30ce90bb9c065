"""Round-5 operator pins: intra-node disk balancer, replica read-path
ordering, RBF mount-table resolution, composite file checksum, BPE
training — each against hand-computed or pure-Python ground truth."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hadoop_source_spark.functions import filechecksum as fc
from hadoop_source_spark.llmops import bpetrain
from hadoop_source_spark.operators import diskbalancer, federation, readpath


# ---------------------------------------------------------------- disk
def _volumes(spark, rows):
    return spark.createDataFrame(
        rows, "node string, volume string, capacity long, used long"
    )


def test_diskbalancer_moves_to_ideal(spark):
    # node n1: density = 600/1200 = 0.5 → ideals 200/400; v0 holds 500
    # (over by 300), v1 holds 100 (under by 300) → one 300-byte move.
    # node n2 is perfectly balanced → no moves.
    rows = [
        ("n1", "v0", 400, 500), ("n1", "v1", 800, 100),
        ("n2", "v0", 400, 200), ("n2", "v1", 400, 200),
    ]
    out = diskbalancer.node_plan(_volumes(spark, rows), threshold=0.1).collect()
    assert len(out) == 1
    m = out[0]
    assert (m.node, m.src_volume, m.dst_volume, m.move_bytes) == (
        "n1", "v0", "v1", 300
    )


def test_diskbalancer_threshold_band_excludes(spark):
    # v0 sits 5% dense above ideal — inside the 10% band, no move even
    # though v1 is far below.
    rows = [("n1", "v0", 1000, 575), ("n1", "v1", 1000, 475)]
    out = diskbalancer.node_plan(_volumes(spark, rows), threshold=0.1).collect()
    assert out == []


def test_diskbalancer_conserves_bytes_multi_volume(spark):
    # 3 over + 2 under volumes: total moved == min(total excess, total
    # deficit) and every move is positive.
    rows = [
        ("n1", "a", 100, 90), ("n1", "b", 100, 80), ("n1", "c", 100, 70),
        ("n1", "d", 100, 5), ("n1", "e", 100, 5),
    ]
    # density = 250/500 = 0.5 → ideal 50 each; excess 40+30+20=90,
    # deficit 45+45=90
    out = diskbalancer.node_plan(_volumes(spark, rows), threshold=0.1).collect()
    assert sum(m.move_bytes for m in out) == 90
    assert all(m.move_bytes > 0 for m in out)
    assert all(m.src_volume in "abc" and m.dst_volume in "de" for m in out)


# ------------------------------------------------------------ readpath
def _replicas(spark, rows):
    return spark.createDataFrame(
        rows,
        "block_id long, node string, node_id long, rack string, dc string,"
        " decommissioned boolean, stale boolean",
    )


def _clients(spark, rows):
    return spark.createDataFrame(
        rows, "client_id long, c_node string, c_rack string, c_dc string"
    )


def test_readpath_weight_ladder(spark):
    reps = _replicas(spark, [
        (1, "h1", 1, "r1", "d1", False, False),   # same node  → 0
        (1, "h2", 2, "r1", "d1", False, False),   # same rack  → 2
        (1, "h3", 3, "r2", "d1", False, False),   # same dc    → 4
        (1, "h4", 4, "r9", "d2", False, False),   # cross-dc   → 6
    ])
    cl = _clients(spark, [(7, "h1", "r1", "d1")])
    out = {r.node: r for r in
           readpath.sort_located_blocks(reps, cl).collect()}
    assert [out[f"h{i}"].weight for i in (1, 2, 3, 4)] == [0, 2, 4, 6]
    assert [out[f"h{i}"].position for i in (1, 2, 3, 4)] == [1, 2, 3, 4]


def test_readpath_inactive_sort_last(spark):
    # decommissioned local replica reads LAST despite weight 0; stale
    # same-rack replica after all healthy but before decommissioned.
    reps = _replicas(spark, [
        (5, "h1", 1, "r1", "d1", True, False),
        (5, "h2", 2, "r1", "d1", False, True),
        (5, "h3", 3, "r9", "d2", False, False),
    ])
    cl = _clients(spark, [(7, "h1", "r1", "d1")])
    out = {r.node: r.position for r in
           readpath.sort_located_blocks(reps, cl).collect()}
    assert out == {"h3": 1, "h2": 2, "h1": 3}
    # without stale avoidance the stale rack-local copy wins
    out2 = {r.node: r.position for r in
            readpath.sort_located_blocks(reps, cl, consider_stale=False)
            .collect()}
    assert out2 == {"h2": 1, "h3": 2, "h1": 3}


# ---------------------------------------------------------- federation
def _mounts(spark, rows):
    return spark.createDataFrame(
        rows,
        "src string, dests array<struct<ns:string,path:string>>,"
        " policy string",
    )


def test_federation_longest_prefix_and_boundary(spark):
    mounts = _mounts(spark, [
        ("/", [("ns0", "/root")], "HASH"),
        ("/data", [("ns1", "/d")], "HASH"),
        ("/data/dir1", [("ns2", "/one")], "HASH"),
    ])
    paths = spark.createDataFrame(
        [("/data/dir1/f",), ("/data/dir10/f",), ("/other/x",)],
        "path string",
    )
    out = {r.path: r for r in
           federation.resolve_paths(paths, mounts).collect()}
    # deepest match wins; /data/dir10 must NOT match /data/dir1
    assert out["/data/dir1/f"].dest_ns == "ns2"
    assert out["/data/dir1/f"].dest_path == "/one/f"
    assert out["/data/dir10/f"].dest_ns == "ns1"
    assert out["/data/dir10/f"].dest_path == "/d/dir10/f"
    assert out["/other/x"].dest_ns == "ns0"
    assert out["/other/x"].dest_path == "/root/other/x"
    assert all(r.matched for r in out.values())


def test_federation_hash_policy_sticky_and_unmatched(spark):
    mounts = _mounts(spark, [
        ("/multi", [("nsA", "/a"), ("nsB", "/b"), ("nsC", "/c")], "HASH"),
        ("/first", [("nsA", "/a"), ("nsB", "/b")], "LOCAL"),
    ])
    paths = spark.createDataFrame(
        [(f"/multi/f{i}", i) for i in range(30)]
        + [("/first/x", 99), ("/nowhere/y", 100)],
        "path string, k long",
    )
    out = federation.resolve_paths(paths, mounts, hash_col=F.col("k"))
    rows = {r.path: r for r in out.collect()}
    # sticky: k mod 3 decides, so the pick is reproducible
    for i in range(30):
        assert rows[f"/multi/f{i}"].dest_ns == "ns" + "ABC"[i % 3]
    # non-HASH policy: first destination
    assert rows["/first/x"].dest_ns == "nsA"
    # no entry (and no root mount): unmatched
    assert not rows["/nowhere/y"].matched
    assert rows["/nowhere/y"].dest_path is None


# ------------------------------------------------------- file checksum
def _py_composite(text: str, bpc: int = 512, cpb: int = 8) -> str:
    def md5(s: bytes) -> str:
        return hashlib.md5(s).hexdigest()

    chunks = [text[i:i + bpc] for i in range(0, len(text), bpc)]
    blocks = [chunks[i:i + cpb] for i in range(0, len(chunks), cpb)]
    bd = [md5("".join(md5(c.encode()) for c in blk).encode())
          for blk in blocks]
    return md5("".join(bd).encode())


def test_composite_checksum_matches_hashlib(spark):
    texts = ["", "a", "x" * 511, "y" * 512, "z" * 513,
             "w" * (512 * 8), "v" * (512 * 8 + 1), "unicode…é" * 300]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = df.select(
        "text", fc.composite_checksum("text", 512, 8).alias("ck")
    ).collect()
    for r in out:
        assert r.ck == _py_composite(r.text), f"len={len(r.text)}"


def test_composite_checksum_block_locality(spark):
    # flipping one char in block 1 changes ONLY block 1's digest
    base = "A" * (512 * 8 * 3)
    mut = base[: 512 * 8 + 5] + "Z" + base[512 * 8 + 6:]
    df = spark.createDataFrame([(base, mut)], "t1 string, t2 string")
    r = df.select(
        fc.block_digests("t1").alias("b1"), fc.block_digests("t2").alias("b2")
    ).collect()[0]
    assert len(r.b1) == len(r.b2) == 3
    assert r.b1[0] == r.b2[0] and r.b1[2] == r.b2[2]
    assert r.b1[1] != r.b2[1]


# ----------------------------------------------------------------- bpe
def _py_bpe(word_freqs: dict[str, int], n: int):
    merges = []
    vocab = {w: list(w) for w in word_freqs}
    for _ in range(n):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_freqs[w]
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_bpe_train_matches_reference(spark):
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "lowest": 4}
    freqs = spark.createDataFrame(list(wf.items()), "word string, freq long")
    got_merges, final = bpetrain.train(freqs, 8)
    exp_merges, exp_vocab = _py_bpe(wf, 8)
    assert got_merges == exp_merges
    got_vocab = {r.word: list(r.symbols) for r in final.collect()}
    assert got_vocab == exp_vocab


def test_bpe_merge_nonoverlapping_fold(spark):
    # 'aaaa' under (a,a): left-to-right gives [aa, aa]; 'aaa' → [aa, a]
    freqs = spark.createDataFrame(
        [("aaaa", 1), ("aaa", 1)], "word string, freq long"
    )
    out = {r.word: list(r.symbols) for r in
           bpetrain.apply_merge(freqs, "a", "a").collect()}
    assert out == {"aaaa": ["aa", "aa"], "aaa": ["aa", "a"]}


def test_bpe_word_freqs_tokenization(spark):
    docs = spark.createDataFrame(
        [("The cat, the CAT—and 42 cats!",)], "text string"
    )
    out = {r.word: r.freq for r in bpetrain.word_freqs(docs).collect()}
    assert out == {"the": 2, "cat": 2, "and": 1, "cats": 1}


# -------------------------------------------------- writable hash
def _java_hash_bytes(s: str) -> int:
    h = 1
    for ch in s.encode():
        b = ch if ch < 128 else ch - 256
        h = ((31 * h + b + 2**31) % 2**32) - 2**31
    return h


def test_writable_hash_matches_java_fold(spark):
    from hadoop_source_spark.functions import hashes

    vals = ["", "a", "abc", "/data/src1/42.txt", "x" * 100,
            "part-00000", "key\twith\ttabs"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    out = {r.s: (r.h, r.p) for r in df.select(
        "s", hashes.writable_hash("s").alias("h"),
        hashes.hash_partition("s", 7).alias("p")).collect()}
    for v in vals:
        exp = _java_hash_bytes(v)
        assert out[v][0] == exp, v
        assert out[v][1] == (exp & 0x7FFFFFFF) % 7, v


# --------------------------------------------------------- trash
def test_trash_expunge_actions(spark):
    import datetime as dt
    from hadoop_source_spark.operators import trash

    now = dt.datetime(2024, 3, 10, 12, 0, 0)
    rows = [
        ("u1", "Current", 10), ("u1", "Current", 20),
        ("u1", "240301120000", 100),   # 216h old -> DELETE at 168h
        ("u1", "240309120000", 7),     # 24h -> KEEP
        ("u2", "notatimestamp", 5),    # SKIP_BAD
    ]
    df = spark.createDataFrame(rows, "user string, dir string, size long")
    out = {(r.user, r.dir): r for r in trash.expunge_plan(
        df, F.lit(now), deletion_interval_hours=168).collect()}
    assert out[("u1", "Current")].action == "CHECKPOINT"
    assert out[("u1", "Current")].n_files == 2
    assert out[("u1", "Current")].bytes == 30
    assert out[("u1", "240301120000")].action == "DELETE"
    assert out[("u1", "240301120000")].reclaimed_bytes == 100
    assert out[("u1", "240301120000")].age_hours == 216.0
    assert out[("u1", "240309120000")].action == "KEEP"
    assert out[("u1", "240309120000")].reclaimed_bytes == 0
    assert out[("u2", "notatimestamp")].action == "SKIP_BAD"


# --------------------------------------------------- volume choice
def test_volume_choice_balanced_round_robin(spark):
    from hadoop_source_spark.operators import volumechoice

    vols = spark.createDataFrame(
        [("v0", 1000), ("v1", 1050), ("v2", 990)],
        "volume string, available long",
    )
    blocks = spark.createDataFrame(
        [(i, 10) for i in range(9)], "block_id long, size long"
    )
    out = {r.block_id: r for r in volumechoice.choose_volumes(
        blocks, vols, threshold=100).collect()}
    assert all(r.tier == "BALANCED_RR" for r in out.values())
    # round robin over name-sorted volumes: block_id % 3
    for i in range(9):
        assert out[i].volume == f"v{i % 3}"


def test_volume_choice_preference_split(spark):
    from hadoop_source_spark.operators import volumechoice

    vols = spark.createDataFrame(
        [("v0", 100), ("v1", 150), ("v2", 5000), ("v3", 6000)],
        "volume string, available long",
    )
    blocks = spark.createDataFrame(
        [(i, 10) for i in range(40)], "block_id long, size long"
    )
    out = volumechoice.choose_volumes(blocks, vols, threshold=1000).collect()
    tiers = {r.block_id: r for r in out}
    n_high = sum(1 for r in out if r.tier == "HIGH_AVAIL")
    # deterministic draw: expect roughly 75% to the high set
    assert 20 <= n_high <= 36
    for r in out:
        if r.tier == "HIGH_AVAIL":
            assert r.volume in ("v2", "v3")
            assert r.volume == ("v2", "v3")[r.block_id % 2]
        else:
            assert r.tier == "LOW_AVAIL"
            assert r.volume in ("v0", "v1")
            assert r.volume == ("v0", "v1")[r.block_id % 2]


# ------------------------------------------------------------ zipf
def test_zipf_fit_matches_lstsq(spark):
    import numpy as np
    from hadoop_source_spark.llmops import textstats

    freqs = [("w%02d" % i, max(1, int(1000 / (i + 1)))) for i in range(40)]
    df = spark.createDataFrame(freqs, "word string, freq long")
    r = textstats.zipf_fit(df).collect()[0]
    # ranks follow freq desc, word asc == input order here
    x = np.log10(np.arange(1, 41))
    y = np.log10([f for _, f in freqs])
    A = np.vstack([x, np.ones_like(x)]).T
    (slope, intercept), res, *_ = np.linalg.lstsq(A, y, rcond=None)
    assert abs(r.slope - slope) < 1e-3
    assert abs(r.intercept - intercept) < 1e-3
    assert r.n_types == 40 and r.n_tokens == sum(f for _, f in freqs)
    assert 0.9 < r.r2 <= 1.0


# ---------------------------------------------------- block scanner
def test_block_scanner_queue(spark):
    import datetime as dt
    from hadoop_source_spark.operators import blockscanner

    now = dt.datetime(2024, 6, 1)
    old = dt.datetime(2024, 4, 1)     # ~1464h ago, past 504h period
    fresh = dt.datetime(2024, 5, 31)  # 24h ago, waits this cycle out
    rows = [
        # volume, block, size, last_scan, suspect, suspect_ts
        ("v1", 1, 3600 * 1048576, old, False, None),
        ("v1", 2, 3600 * 1048576, None, False, None),
        ("v1", 3, 100, fresh, True, dt.datetime(2024, 5, 31, 10)),
        ("v1", 4, 100, fresh, False, None),   # dropped: fresh, not suspect
        ("v2", 5, 7200 * 1048576, None, False, None),
    ]
    df = spark.createDataFrame(
        rows,
        "volume string, block_id long, size_bytes long,"
        " last_scan_ts timestamp, suspect boolean, suspect_ts timestamp",
    )
    out = {r.block_id: r for r in
           blockscanner.scan_queue(df, F.lit(now)).collect()}
    assert 4 not in out
    # suspect first, then never-scanned (null oldest), then stale
    assert out[3].position == 1 and out[3].eta_hours == 0.0
    assert out[3].bytes_ahead == 0
    assert out[2].position == 2
    assert out[1].position == 3
    # block 1 waits behind the suspect (tiny) + block 2 (1h at 1 MiB/s)
    assert abs(out[1].eta_hours - 1.0) < 0.01
    assert out[5].position == 1 and out[5].eta_hours == 0.0


# -------------------------------------------------- observer reads
def test_observer_read_routing(spark):
    from hadoop_source_spark.operators import observer

    nns = spark.createDataFrame(
        [("nn0", "ACTIVE", 1000, 1.0),
         ("nn1", "OBSERVER", 990, 5.0),
         ("nn2", "OBSERVER", 970, 2.0),
         ("nn3", "STANDBY", 1000, 0.5)],
        "nn string, state string, applied_txid long, latency_ms double",
    )
    reads = spark.createDataFrame(
        [(1, 960), (2, 980), (3, 995), (4, 1000)],
        "client_id long, last_seen_txid long",
    )
    out = {r.client_id: r for r in
           observer.route_reads(reads, nns).collect()}
    # client 1: both observers caught up -> lowest latency nn2
    assert (out[1].serving_nn, out[1].serving_mode) == ("nn2", "OBSERVER")
    assert out[1].lag_txns == 30
    # client 2: only nn1 caught up
    assert out[2].serving_nn == "nn1" and out[2].lag_txns == 10
    # clients 3, 4: no observer caught up -> Active (STANDBY never serves)
    assert out[3].serving_mode == "ACTIVE_FALLBACK"
    assert out[3].serving_nn == "nn0" and out[3].lag_txns == 0
    assert out[4].serving_mode == "ACTIVE_FALLBACK"


# ------------------------------------------------------- rbf quota
def test_rbf_quota_aggregation(spark):
    from hadoop_source_spark.operators import federation

    usage = spark.createDataFrame(
        [("/m1", "ns0", 10, 100), ("/m1", "ns1", 15, 250),
         ("/m2", "ns0", 3, 30)],
        "mount_src string, sub string, n_files long, n_bytes long",
    )
    quotas = spark.createDataFrame(
        [("/m1", 20, 1000), ("/m2", -1, -1)],
        "mount string, ns_quota long, ss_quota long",
    )
    out = {r.mount: r for r in
           federation.aggregate_quota(usage, quotas).collect()}
    m1 = out["/m1"]
    assert (m1.files_used, m1.bytes_used, m1.n_subclusters) == (25, 350, 2)
    assert m1.ns_violated and not m1.ss_violated
    assert m1.ns_remaining == -5 and m1.ss_remaining == 650
    m2 = out["/m2"]
    assert not m2.ns_violated and not m2.ss_violated
    assert m2.ns_remaining is None and m2.ss_remaining is None


# ------------------------------------------------------ bpe segment
def test_bpe_segment_matches_training_symbols(spark):
    # applying the trained merges to the training words must reproduce
    # the trainer's final symbol table (BPE consistency property)
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "lowest": 4}
    freqs = spark.createDataFrame(list(wf.items()), "word string, freq long")
    merges, final = bpetrain.train(freqs, 10)
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(wf)], "doc_id long, text string"
    )
    seg = {r.doc_id: r for r in bpetrain.segment(docs, merges).collect()}
    trained = {r.word: list(r.symbols) for r in final.collect()}
    for i, w in enumerate(wf):
        assert list(seg[i].first_pieces) == trained[w][:8], w
        assert seg[i].n_words == 1
        assert seg[i].n_pieces == len(trained[w])


def test_bpe_segment_rank_priority_not_greedy(spark):
    # merges ranked: (b,c) before (a,b): "abc" must become [a, bc]
    docs = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    out = bpetrain.segment(docs, [("b", "c"), ("a", "b")]).collect()[0]
    assert list(out.first_pieces) == ["a", "bc"]


# -------------------------------------------- nnstorage retention
def test_retention_purge_rules(spark):
    from hadoop_source_spark.operators import editlog as el

    images = spark.createDataFrame(
        [(100,), (200,), (300,)], "txid long"
    )
    segments = spark.createDataFrame(
        [(1, 80), (81, 150), (151, 199), (200, 260), (261, 310)],
        "first_txid long, last_txid long",
    )
    out = {(r.kind, r.first_txid): r for r in el.retention_purge(
        images, segments, retain_images=2, extra_edits=50).collect()}
    # images: keep 300, 200; purge 100
    assert out[("image", 300)].action == "KEEP"
    assert out[("image", 200)].action == "KEEP"
    assert out[("image", 100)].action == "PURGE"
    # min retained image = 200 -> min_required = 201, purge_from = 151
    assert out[("edits", 1)].action == "PURGE"
    assert out[("edits", 81)].action == "PURGE"
    # segment 151-199: last < 201 but >= purge_from -> CUSHION, kept whole
    s3 = out[("edits", 151)]
    assert (s3.action, s3.reason) == ("KEEP", "CUSHION")
    assert out[("edits", 200)].reason == "REQUIRED"
    assert out[("edits", 261)].reason == "REQUIRED"


def test_retention_purge_from_floor_at_zero(spark):
    from hadoop_source_spark.operators import editlog as el

    images = spark.createDataFrame([(5,)], "txid long")
    segments = spark.createDataFrame(
        [(1, 4), (5, 9)], "first_txid long, last_txid long"
    )
    out = {r.first_txid: r for r in el.retention_purge(
        images, segments, retain_images=1, extra_edits=1000).collect()
        if r.kind == "edits"}
    # purge_from = max(6 - 1000, 0) = 0 -> nothing purgeable
    assert all(r.action == "KEEP" for r in out.values())


# ----------------------------------------------- checksum distcp
def test_checksum_sync_plan_ops(spark):
    from hadoop_source_spark.operators import distcp

    src = spark.createDataFrame(
        [("/same", "A" * 600), ("/diff", "B" * 600), ("/srconly", "x")],
        "path string, text string",
    )
    dst = spark.createDataFrame(
        # /diff: first block (4*64=256 chars) intact, tail changed
        [("/same", "A" * 600), ("/diff", "B" * 256 + "C" * 344),
         ("/dstonly", "y")],
        "path string, text string",
    )
    out = {r.path: r for r in
           distcp.checksum_sync_plan(src, dst).collect()}
    assert out["/same"].op == "SKIP" and out["/same"].n_blocks_changed == 0
    d = out["/diff"]
    assert d.op == "UPDATE"
    # 600 chars -> 3 blocks of 256; block 0 equal, blocks 1-2 differ
    assert (d.src_blocks_n, d.dst_blocks_n, d.n_blocks_changed) == (3, 3, 2)
    assert out["/srconly"].op == "COPY"
    assert out["/dstonly"].op == "DELETE"


# ----------------------------------------------------- slow peers
def test_slow_peer_mad_outlier(spark):
    from hadoop_source_spark.operators import datanodes

    # 11 nodes tightly clustered at ~10ms, one at 100ms
    rows = []
    for n in range(11):
        lat = 10.0 + n * 0.1
        rows += [(f"rep{r}", f"dn{n}", lat) for r in range(3)]
    rows += [("rep0", "slow", 100.0), ("rep1", "slow", 100.0)]
    df = spark.createDataFrame(
        rows, "reporting_node string, reported_node string, latency_ms double"
    )
    out = {r.node: r for r in datanodes.slow_peer_outliers(df).collect()}
    assert out["slow"].is_outlier
    assert not any(r.is_outlier for n, r in out.items() if n != "slow")
    # threshold respects max(low, median*3, median+3*MAD)
    r = out["slow"]
    import math
    assert math.isclose(r.threshold_ms, max(5.0, r.median_ms * 3,
                                            r.median_ms + 3 * r.mad_ms),
                        rel_tol=1e-6)


def test_slow_peer_min_nodes_gate(spark):
    from hadoop_source_spark.operators import datanodes

    rows = [("r0", "a", 10.0), ("r0", "b", 500.0)]
    df = spark.createDataFrame(
        rows, "reporting_node string, reported_node string, latency_ms double"
    )
    out = datanodes.slow_peer_outliers(df, min_nodes=10).collect()
    assert not any(r.is_outlier for r in out)


# --------------------------------------------------- bitext mining
def test_margin_bitext_exact_vs_numpy(spark):
    import numpy as np
    from hadoop_source_spark.llmops import similarity as sim2

    rng = np.random.RandomState(7)
    S = rng.randn(12, 16); D = rng.randn(15, 16)
    src = spark.createDataFrame(
        [(i, [float(x) for x in S[i]]) for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    dst = spark.createDataFrame(
        [(100 + i, [float(x) for x in D[i]]) for i in range(15)],
        "vec_id long, embedding array<float>",
    )
    got = {r.src_id: r for r in
           sim2.margin_bitext_mine(src, dst, k=3, num_blocks=2).collect()}

    # numpy ground truth (float32 like the arrow path reads, then f64)
    Sf = S.astype("float32").astype("float64")
    Df = D.astype("float32").astype("float64")
    Sn = Sf / np.linalg.norm(Sf, axis=1, keepdims=True)
    Dn = Df / np.linalg.norm(Df, axis=1, keepdims=True)
    cos = np.round(Sn @ Dn.T, 6)
    for i in range(12):
        order = np.lexsort((np.arange(15) + 100, -cos[i]))
        best = order[0]
        avg_x = cos[i, order[:3]].mean()
        oy = np.lexsort((np.arange(12), -cos[:, best]))
        avg_y = cos[oy[:3], best].mean()
        r = got[i]
        assert r.dst_id == 100 + best, i
        assert abs(r.cosine - cos[i, best]) < 1e-9
        assert abs(r.margin - round(cos[i, best] / ((avg_x + avg_y) / 2), 6)) < 2e-6
        assert r.mutual == (oy[0] == i)


# ------------------------------------------------- ec feasibility
def test_ec_policy_feasibility_rules(spark):
    from hadoop_source_spark.operators import placement

    topo = spark.createDataFrame(
        [(f"n{i}", f"r{i % 3}") for i in range(12)], "node string, rack string"
    )
    pol = spark.createDataFrame(
        [("XOR-2-1", 2, 1), ("RS-3-2", 3, 2), ("RS-6-3", 6, 3),
         ("RS-10-4", 10, 4), ("RS-BIG", 20, 8)],
        "policy string, data_units int, parity_units int",
    )
    out = {r.policy: r for r in
           placement.ec_policy_feasibility(topo, pol).collect()}
    # 12 nodes, 3 racks
    x = out["XOR-2-1"]     # group 3, total 3, racks 3 -> mpr (3-1)//3+1 = 1
    assert (x.max_per_rack, x.rack_failures_tolerated,
            x.full_group_placeable) == (1, 1, True)
    r63 = out["RS-6-3"]    # group 9 -> mpr (9-1)//3+1 = 3 -> tol 3//3 = 1
    assert (r63.max_per_rack, r63.rack_failures_tolerated) == (3, 1)
    r104 = out["RS-10-4"]  # group 14 > 12 nodes -> total 12, mpr 4, tol 1
    assert (r104.effective_units, r104.max_per_rack,
            r104.full_group_placeable) == (12, 4, False)
    big = out["RS-BIG"]    # group 28 -> total 12
    assert big.effective_units == 12 and not big.full_group_placeable


def test_ec_policy_single_rack_and_oneunit(spark):
    from hadoop_source_spark.operators import placement

    topo = spark.createDataFrame(
        [(f"n{i}", "r0") for i in range(5)], "node string, rack string"
    )
    pol = spark.createDataFrame(
        [("RS-3-2", 3, 2), ("ONE", 1, 0)],
        "policy string, data_units int, parity_units int",
    )
    out = {r.policy: r for r in
           placement.ec_policy_feasibility(topo, pol).collect()}
    # single rack: all units co-rack -> zero rack failures tolerated
    assert out["RS-3-2"].max_per_rack == 5
    assert out["RS-3-2"].rack_failures_tolerated == 0
    assert out["ONE"].max_per_rack == 1


# ---------------------------------------------------- hedged reads
def test_hedged_read_eta(spark):
    from hadoop_source_spark.operators import readpath

    rows = [
        # block 1: slow primary (10ms), fast secondary (2ms) -> hedge wins
        (1, 7, "h1", 1, 10.0), (1, 7, "h2", 2, 2.0),
        # block 2: fast primary -> hedge never fires
        (2, 7, "h1", 1, 1.0), (2, 7, "h2", 2, 2.0),
        # block 3: single replica
        (3, 7, "h9", 1, 4.0),
    ]
    df = spark.createDataFrame(
        rows,
        "block_id long, client_id long, node string, position int,"
        " latency_ms double",
    )
    out = {r.block_id: r for r in
           readpath.hedged_read_eta(df, threshold_ms=3.0).collect()}
    assert out[1].primary_node == "h1"
    assert out[1].eta_ms == 5.0 and out[1].hedged_helps
    assert out[2].eta_ms == 1.0 and not out[2].hedged_helps
    assert out[3].eta_ms == 4.0 and not out[3].hedged_helps


# ------------------------------------------------ block report diff
def test_block_report_diff_buckets(spark):
    from hadoop_source_spark.operators import datanodes

    expected = spark.createDataFrame(
        [("dn1", 1, 10, 100, True), ("dn1", 2, 10, 100, True),
         ("dn1", 3, 10, 100, True), ("dn1", 4, 10, 100, False),
         ("dn1", 6, 10, 100, True)],
        "node string, block_id long, genstamp long, num_bytes long,"
        " recorded boolean",
    )
    reported = spark.createDataFrame(
        [("dn1", 1, 10, 100, "FINALIZED"),   # OK
         ("dn1", 2, 11, 100, "FINALIZED"),   # genstamp -> TO_CORRUPT
         ("dn1", 4, 10, 100, "FINALIZED"),   # unrecorded -> TO_ADD
         ("dn1", 5, 10, 100, "FINALIZED"),   # unknown -> TO_INVALIDATE
         ("dn1", 6, 10, 100, "RBW")],        # under construction -> TO_UC
        "node string, block_id long, genstamp long, num_bytes long,"
        " state string",
    )
    out = {r.block_id: r.action for r in
           datanodes.block_report_diff(expected, reported).collect()}
    assert out == {1: "OK", 2: "TO_CORRUPT", 3: "TO_REMOVE",
                   4: "TO_ADD", 5: "TO_INVALIDATE", 6: "TO_UC"}


# ------------------------------------------------ maintenance gate
def test_maintenance_readiness(spark):
    from hadoop_source_spark.operators import datanodes

    replicas = spark.createDataFrame(
        [(1, "m1", True), (1, "a", True),          # fine: 1 outside
         (2, "m1", True),                          # blocking: 0 outside
         (3, "m2", True), (3, "b", True), (3, "c", True),
         (4, "m2", True), (4, "m1", True)],        # blocking: both entering
        "block_id long, node string, live boolean",
    )
    entering = spark.createDataFrame([("m1",), ("m2",)], "node string")
    out = {r.node: r for r in
           datanodes.maintenance_readiness(replicas, entering).collect()}
    assert out["m1"].n_blocks == 3 and out["m1"].n_blocking == 2
    assert not out["m1"].ready
    assert out["m2"].n_blocks == 2 and out["m2"].n_blocking == 1
    assert not out["m2"].ready
    # with the floor at 0 every node is ready
    out0 = {r.node: r.ready for r in datanodes.maintenance_readiness(
        replicas, entering, min_maintenance_repl=0).collect()}
    assert out0 == {"m1": True, "m2": True}


# --------------------------------------------- snapshot reclaim
def test_snapshot_delete_reclaim(spark):
    from hadoop_source_spark.operators import setops

    files = spark.createDataFrame(
        # created, deleted: f1 retained by snaps 2 only; f2 by 2,3;
        # f3 live (never reclaimable); f4 retained by none (died
        # between snapshots)
        [(1, 100, 2, 3), (2, 50, 2, 4), (3, 70, 0, None), (4, 30, 5, 6)],
        "file_id long, bytes long, created_gen long, deleted_gen long",
    )
    snaps = spark.createDataFrame([(2,), (3,), (7,)], "gen long")
    out = {r.gen: r for r in
           setops.snapshot_delete_reclaim(files, snaps).collect()}
    assert out[2].n_sole_files == 1 and out[2].reclaimed_bytes == 100
    # f2 retained by 2 AND 3 -> deleting either alone reclaims nothing
    assert out[3].n_sole_files == 0 and out[3].reclaimed_bytes == 0
    assert out[7].n_sole_files == 0


# ------------------------------------------------ config resolution
def test_config_layering_final_and_deprecation(spark):
    from hadoop_source_spark.operators import confres

    props = spark.createDataFrame(
        [
            (0, "a", "default-a", False),
            (1, "a", "site-a", False),          # later wins
            (0, "b", "default-b", True),        # final freezes
            (1, "b", "site-b", False),          # ignored
            (2, "b", "cluster-b", True),        # ignored too
            (0, "old.key", "via-old", False),   # deprecated alias of c
            (1, "c", "via-new", False),
        ],
        "resource_order int, name string, value string, final boolean",
    )
    dep = spark.createDataFrame(
        [("old.key", "c")], "old_name string, new_name string"
    )
    out = {r.name: r for r in
           confres.resolve_layers(props, dep).collect()}
    assert out["a"].value == "site-a" and not out["a"].final
    assert out["b"].value == "default-b" and out["b"].final
    assert out["b"].n_ignored == 2
    # both names collapse onto c; later resource wins
    assert out["c"].value == "via-new"
    assert "old.key" not in out


def test_config_var_expansion(spark):
    from hadoop_source_spark.operators import confres

    resolved = spark.createDataFrame(
        [
            ("base", "/opt"),
            ("dir", "${base}/data"),
            ("deep", "${dir}/x and ${dir}/y"),
            ("unbound", "${nope}/z"),
            ("plain", "v"),
        ],
        "name string, value string",
    )
    out = {r.name: r.value for r in
           confres.expand_vars(resolved).collect()}
    assert out["dir"] == "/opt/data"
    assert out["deep"] == "/opt/data/x and /opt/data/y"
    assert out["unbound"] == "${nope}/z"
    assert out["plain"] == "v"


def test_config_max_subst_cap(spark):
    import pytest

    from hadoop_source_spark.operators import confres

    # a BOUND chain deeper than max_subst RAISES — the reference throws
    # "Variable substitution depth too large" (Configuration.java:1146)
    # rather than returning quietly partial values
    rows = [("k0", "end")] + [
        (f"k{i}", f"${{k{i-1}}}+") for i in range(1, 6)
    ]
    resolved = spark.createDataFrame(rows, "name string, value string")
    with pytest.raises(ValueError, match="substitution depth too large"):
        confres.expand_vars(resolved, max_subst=2).collect()
    full = {r.name: r.value for r in
            confres.expand_vars(resolved, max_subst=20).collect()}
    assert full["k5"] == "end+++++"


def test_config_cycle_raises(spark):
    import pytest

    from hadoop_source_spark.operators import confres

    # a=${b}, b=${a} never converges — fail loudly, naming the keys
    resolved = spark.createDataFrame(
        [("a", "${b}"), ("b", "${a}"), ("ok", "v")],
        "name string, value string",
    )
    with pytest.raises(ValueError, match="substitution depth too large"):
        confres.expand_vars(resolved, max_subst=4).collect()


# ------------------------------------------------------ proxy users
def test_proxy_user_authorize_matrix(spark):
    from hadoop_source_spark.operators import permcheck as pc

    conf = spark.createDataFrame(
        [
            ("oozie", ["*"], [], ["h1", "h2"]),
            ("hive", [], ["analysts"], ["*"]),
            ("hue", ["alice"], [], []),
        ],
        "superuser string, allowed_users array<string>,"
        " allowed_groups array<string>, allowed_hosts array<string>",
    )
    reqs = spark.createDataFrame(
        [
            (1, "oozie", "bob", ["eng"], "h1"),      # user wildcard + host ok
            (2, "oozie", "bob", ["eng"], "h9"),      # HOST_DENIED
            (3, "hive", "carol", ["analysts"], "x"), # group + host wildcard
            (4, "hive", "dave", ["eng"], "x"),       # USER_NOT_ALLOWED
            (5, "hue", "alice", [], "h1"),           # empty host list denies
            (6, "nobody", "z", [], "h1"),            # NO_PROXY_CONF
            (7, None, "self", [], "h1"),             # not proxying
        ],
        "req long, real_user string, effective_user string,"
        " effective_groups array<string>, client_host string",
    )
    out = {r.req: r for r in
           pc.proxy_user_authorize(reqs, conf).collect()}
    assert out[1].allowed and out[1].deny_reason is None
    assert (not out[2].allowed) and out[2].deny_reason == "HOST_DENIED"
    assert out[3].allowed
    assert out[4].deny_reason == "USER_NOT_ALLOWED"
    assert out[5].deny_reason == "HOST_DENIED"
    assert out[6].deny_reason == "NO_PROXY_CONF"
    assert out[7].allowed


def test_proxy_user_group_only_conf(spark):
    """A group-only proxyuser config (allowed_users NULL — the
    hadoop.proxyuser.X.groups-without-.users shape) is CONFIGURED:
    it authorizes by group and denies by user, never NO_PROXY_CONF;
    that reason is reserved for a superuser with no conf row at all
    (DefaultImpersonationProvider.java:109)."""
    from hadoop_source_spark.operators import permcheck as pc

    conf = spark.createDataFrame(
        [("hive", None, ["analysts"], None)],
        "superuser string, allowed_users array<string>,"
        " allowed_groups array<string>, allowed_hosts array<string>",
    )
    reqs = spark.createDataFrame(
        [
            (1, "hive", "carol", ["analysts"], "h1"),  # group admits...
            (2, "hive", "dave", ["eng"], "h1"),        # wrong group
            (3, "hive", "erin", None, "h1"),           # null groups
            (4, "ghost", "z", ["analysts"], "h1"),     # truly unconfigured
        ],
        "req long, real_user string, effective_user string,"
        " effective_groups array<string>, client_host string",
    )
    out = {r.req: r for r in
           pc.proxy_user_authorize(reqs, conf).collect()}
    # ...but the null host list admits no host
    assert out[1].deny_reason == "HOST_DENIED"
    assert out[2].deny_reason == "USER_NOT_ALLOWED"
    assert out[3].deny_reason == "USER_NOT_ALLOWED"
    assert out[4].deny_reason == "NO_PROXY_CONF"


# --------------------------------------------------- retry schedule
def test_retry_schedule_policies(spark):
    from hadoop_source_spark.operators import rpcsched

    calls = spark.createDataFrame([(1, 5)], "call_id long, n_failures int")
    pol = spark.createDataFrame(
        [("TRY_ONCE_THEN_FAIL", 0, 0.0), ("RETRY_FOREVER", 0, 0.0),
         ("FIXED_SLEEP", 3, 10.0), ("PROPORTIONAL_SLEEP", 3, 10.0),
         ("EXPONENTIAL_BACKOFF", 3, 10.0)],
        "policy string, max_retries int, sleep_ms double",
    )
    rows = rpcsched.retry_schedule(calls, pol).collect()
    by = {}
    for r in rows:
        by.setdefault(r.policy, {})[r.attempt] = r
    assert all(r.action == "FAIL" for r in by["TRY_ONCE_THEN_FAIL"].values())
    assert all(r.action == "RETRY" and r.sleep_ms == 0.0
               for r in by["RETRY_FOREVER"].values())
    f = by["FIXED_SLEEP"]
    assert [f[i].action for i in range(5)] == ["RETRY"] * 3 + ["FAIL"] * 2
    assert f[2].cum_sleep_ms == 30.0
    p = by["PROPORTIONAL_SLEEP"]
    assert [p[i].sleep_ms for i in range(3)] == [10.0, 20.0, 30.0]
    e = by["EXPONENTIAL_BACKOFF"]
    assert [e[i].sleep_ms for i in range(3)] == [20.0, 40.0, 80.0]
    assert e[4].action == "FAIL" and e[4].sleep_ms == 0.0


# --------------------------------------------------- token entropy
def test_token_entropy_hand_computed(spark):
    import math
    from hadoop_source_spark.llmops import textstats as ts2

    docs = spark.createDataFrame(
        [("s1", "a a a a b b c d"),   # counts 4,2,1,1 over N=8
         ("s2", "x x x x")],          # single type -> H = 0
        "source string, text string",
    )
    out = {r.grp: r for r in ts2.token_entropy(docs).collect()}
    probs = [4 / 8, 2 / 8, 1 / 8, 1 / 8]
    h = -sum(p * math.log2(p) for p in probs)
    assert abs(out["s1"].entropy_bits - round(h, 6)) < 1e-6
    assert out["s1"].n_tokens == 8 and out["s1"].n_types == 4
    assert abs(out["s1"].perplexity - round(2 ** h, 4)) < 1e-3
    assert out["s2"].entropy_bits == 0.0 and out["s2"].perplexity == 1.0


# ---------------------------------------------- heavy hitters (MG)
def _mg_fold(seq, capacity):
    c = {}
    for k in seq:
        if k in c:
            c[k] += 1
        elif len(c) < capacity:
            c[k] = 1
        else:
            for kk in list(c):
                c[kk] -= 1
                if c[kk] == 0:
                    del c[kk]
    return c


def test_mg_bound_property():
    # classic Misra-Gries guarantee on the lossy regime
    seq = (["a"] * 40 + ["b"] * 25 + ["c"] * 5 + ["d"] * 5
           + [f"z{i}" for i in range(25)])
    c = _mg_fold(seq, capacity=3)
    n = len(seq)
    true = {"a": 40, "b": 25, "c": 5, "d": 5}
    for k, v in c.items():
        t = true.get(k, 1)
        assert v <= t and t - v <= n / 3
    # any key with freq > n/(cap+1) = 25 must survive
    assert "a" in c


def test_heavy_hitters_stream_exact_regime(spark):
    import collections
    import tempfile
    import time
    import uuid
    from hadoop_source_spark.streaming import events as se

    with tempfile.TemporaryDirectory() as d:
        half1 = [("g1", f"k{i % 5}") for i in range(20)] + [
            ("g2", f"k{i % 3}") for i in range(6)
        ]
        half2 = [("g1", f"k{i % 4}") for i in range(16)] + [
            ("g2", f"k{i % 3}") for i in range(9)
        ]
        spark.createDataFrame(half1, "grp string, key string").coalesce(
            1
        ).write.mode("append").parquet(d)
        time.sleep(1.1)
        spark.createDataFrame(half2, "grp string, key string").coalesce(
            1
        ).write.mode("append").parquet(d)
        stream = (
            spark.readStream.schema("grp string, key string")
            .option("maxFilesPerTrigger", 1).parquet(d)
        )
        name = f"t_hh_{uuid.uuid4().hex[:8]}"
        out = se.run_to_memory(
            se.heavy_hitters_stream(stream, capacity=16),
            name, output_mode="update",
        )
        fb = {r.grp: r.b for r in out.groupBy("grp").agg(
            F.max("batch").alias("b")).collect()}
        final = [r for r in out.collect() if r.batch == fb[r.grp]]
        got = {(r.grp, r.key): r.cnt for r in final}
        want = collections.Counter()
        for g, k in half1 + half2:
            want[(g, k)] += 1
        assert got == dict(want)
        # statefulness: two emissions for g1 (one per micro-batch)
        assert len({r.batch for r in out.collect() if r.grp == "g1"}) == 2


# --------------------------------------------------- machine lists
def test_machine_list_includes(spark):
    from hadoop_source_spark.operators import permcheck as pc

    ips = ["10.1.5.5", "10.1.5.6", "10.2.77.3", "10.3.0.1",
           "192.168.1.200", "192.168.2.1"]
    df = spark.createDataFrame([(i,) for i in ips], "ip string")
    entries = ["10.1.5.5", "10.2.0.0/16", "192.168.1.0/24"]
    out = {r.ip: r.m for r in df.select(
        "ip", pc.machine_list_includes("ip", entries).alias("m")).collect()}
    assert out == {"10.1.5.5": True, "10.1.5.6": False,
                   "10.2.77.3": True, "10.3.0.1": False,
                   "192.168.1.200": True, "192.168.2.1": False}
    # exact wildcard list admits everything
    allw = df.select(pc.machine_list_includes("ip", ["*"]).alias("m"))
    assert all(r.m for r in allw.collect())
    # MachineList.java:100: wildcard only for the exact singleton
    # ['*'] — '*' in a MIXED list is a dead hostname entry, so only
    # the concrete entries match (fail-open would be an auth hole)
    mixed = {r.ip: r.m for r in df.select(
        "ip", pc.machine_list_includes("ip", ["*", "10.1.5.5"]).alias("m")
    ).collect()}
    assert mixed == {"10.1.5.5": True, "10.1.5.6": False,
                     "10.2.77.3": False, "10.3.0.1": False,
                     "192.168.1.200": False, "192.168.2.1": False}
    # a list of ONLY dead '*' entries admits nothing
    none = df.select(pc.machine_list_includes("ip", ["*", "*"]).alias("m"))
    assert not any(r.m for r in none.collect())


# ------------------------------------------------ WRR call multiplexer
def test_wrr_drain_order_reference_example(spark):
    """The javadoc's own example (WeightedRoundRobinMultiplexer.java:30):
    weights [9,4,1] → a 14-read cycle reading queue 0 nine times, queue
    1 four times, queue 2 once, then repeat."""
    from hadoop_source_spark.operators import rpcsched

    calls = spark.createDataFrame(
        [(100 * q + p, q, p) for q in range(3) for p in range(20)],
        "call_id long, queue int, arrival_seq long",
    )
    out = {r.call_id: r.serve_slot for r in rpcsched.wrr_drain_order(
        calls, num_queues=3, weights=[9, 4, 1]).collect()}
    # first cycle
    assert [out[p] for p in range(9)] == list(range(9))        # q0 p0-8
    assert [out[100 + p] for p in range(4)] == [9, 10, 11, 12]  # q1 p0-3
    assert out[200] == 13                                       # q2 p0
    # second cycle picks up where the first left off
    assert out[9] == 14 and out[104] == 23 and out[201] == 27
    # saturated schedule is a permutation: no two calls share a slot
    slots = list(out.values())
    assert len(slots) == len(set(slots))


def test_wrr_default_weights_and_validation(spark):
    import pytest

    from hadoop_source_spark.operators import rpcsched

    calls = spark.createDataFrame(
        [(q, q, 0) for q in range(4)],
        "call_id long, queue int, arrival_seq long",
    )
    # default 2^N weights [8,4,2,1]: first call of each queue drains at
    # its prefix (0, 8, 12, 14)
    out = {r.queue: r.serve_slot for r in
           rpcsched.wrr_drain_order(calls, num_queues=4).collect()}
    assert out == {0: 0, 1: 8, 2: 12, 3: 14}
    with pytest.raises(ValueError, match="exactly 4 weights"):
        rpcsched.wrr_drain_order(calls, num_queues=4, weights=[1, 2])


# ------------------------------------------------------ RPC retry cache
def test_retry_cache_state_machine(spark):
    """RetryCache.waitForCompletion semantics: hits return the cached
    outcome; a FAILED cached attempt re-executes on retry; expiration
    anchors at the entry's ADD time (re-executions do not extend it)
    and ts == expiry boundary is NOT yet expired."""
    from hadoop_source_spark.operators import rpcsched

    rows = [
        # chain A: success → hit → expiry boundary hit → expired
        ("cA", 1, 0, True),
        ("cA", 1, 5, True),    # CACHE_HIT
        ("cA", 1, 10, True),   # ts == 0+10 → still a HIT (strict >)
        ("cA", 1, 11, True),   # NEW_AFTER_EXPIRY
        # chain B: failure → retry re-executes → hit; expiry still
        # anchored at the ORIGINAL add (t=0), not the re-execution
        ("cB", 2, 0, False),
        ("cB", 2, 3, True),    # RETRY_EXECUTE (same epoch)
        ("cB", 2, 5, False),   # CACHE_HIT (last exec succeeded; outcome col ignored)
        ("cB", 2, 12, True),   # NEW_AFTER_EXPIRY (12 > 0+10, not 3+10)
    ]
    df = spark.createDataFrame(
        rows, "client_id string, call_id long, ts long, succeeded boolean"
    )
    out = {(r.client_id, r.ts): r for r in
           rpcsched.retry_cache_replay(df, expiry=10).collect()}
    assert out[("cA", 0)].action == "NEW" and out[("cA", 0)].executed
    assert out[("cA", 5)].action == "CACHE_HIT" and not out[("cA", 5)].executed
    assert out[("cA", 10)].action == "CACHE_HIT"
    assert out[("cA", 11)].action == "NEW_AFTER_EXPIRY"
    assert out[("cA", 11)].epoch_start == 11
    assert out[("cB", 0)].action == "NEW"
    assert out[("cB", 3)].action == "RETRY_EXECUTE" and out[("cB", 3)].executed
    assert out[("cB", 3)].epoch_start == 0   # anchored at original add
    assert out[("cB", 5)].action == "CACHE_HIT"
    assert out[("cB", 12)].action == "NEW_AFTER_EXPIRY"
