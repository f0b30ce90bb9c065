"""PROVIDED storage pins (TextFileRegionAliasMap.java:346-367,443-458,
487-489; ProvidedStorageMap.java:237-299)."""

from __future__ import annotations

import pytest

from hadoop_source_spark.operators import aliasmap as am

R_SCHEMA = (
    "bpid string, block_id long, path string, offset long,"
    " length long, gen_stamp long, nonce binary"
)
S_SCHEMA = "block_id long, slot int, node_id string, storage_type string"


def test_codec_round_trip_and_wire_bytes(spark):
    regions = [
        ("bp1", 2, "/data/a", 0, 128, 1001, bytearray(b"xy")),
        ("bp1", 1, "/data/b", 64, 32, 1002, bytearray(b"")),
        ("bp2", 9, "/data/c", 8, 16, 1003, None),
    ]
    df = spark.createDataFrame(regions, R_SCHEMA)
    blobs = {
        r["bpid"]: (r["file_name"], bytes(r["data"]))
        for r in am.encode_alias_map(df).collect()
    }
    # exact wire bytes: block-id order, 5 fields without nonce, the
    # Base64 sixth field only when non-empty, trailing newline
    assert blobs["bp1"] == (
        "blocks_bp1.csv",
        b"1,/data/b,64,32,1002\n2,/data/a,0,128,1001,eHk=\n",
    )
    assert blobs["bp2"][1] == b"9,/data/c,8,16,1003\n"
    back = am.decode_alias_map(am.encode_alias_map(df)).collect()
    by = {(r["bpid"], r["block_id"]): r for r in back}
    assert bytes(by[("bp1", 2)]["nonce"]) == b"xy"
    assert bytes(by[("bp1", 1)]["nonce"]) == b""  # empty, not null
    assert by[("bp2", 9)]["path"] == "/data/c"
    assert len(back) == 3


def test_decoder_rejects_bad_field_count(spark):
    blobs = spark.createDataFrame(
        [("bp1", bytearray(b"1,/p,0,8\n"))], "bpid string, data binary"
    )
    with pytest.raises(Exception, match="Invalid line"):
        am.decode_alias_map(blobs).collect()


def _locate(spark, storages, dns, repl=3):
    out = am.provided_locations(
        spark.createDataFrame(storages, S_SCHEMA),
        spark.createDataFrame([(d,) for d in dns], "node_id string"),
        default_replication=repl,
    ).collect()
    res = {}
    for r in out:
        res.setdefault(r["block_id"], []).append(
            (r["pos"], r["node_id"], r["storage_type"])
        )
    return {b: [x[1:] for x in sorted(v)] for b, v in res.items()}


def test_local_only_block_untouched(spark):
    locs = _locate(
        spark,
        [(1, 0, "dnA", "DISK"), (1, 1, "dnB", "SSD")],
        ["p1", "p2"],
    )
    assert locs[1] == [("dnA", "DISK"), ("dnB", "SSD")]


def test_provided_block_fills_to_replication(spark):
    # one local + PROVIDED marker; repl 3, three active provided dns
    locs = _locate(
        spark,
        [(1, 0, "dnA", "DISK"), (1, 1, "prov", "PROVIDED")],
        ["p2", "p1", "p3"],
    )
    # local first, then smallest-id provided picks up to min(3, 3)
    assert locs[1] == [
        ("dnA", "DISK"), ("p1", "PROVIDED"), ("p2", "PROVIDED")]


def test_first_provided_added_even_over_replication(spark):
    # three locals already meet repl=3: the first provided location is
    # still appended (:276-280), but no extras
    locs = _locate(
        spark,
        [(1, 0, "dnA", "DISK"), (1, 1, "dnB", "DISK"),
         (1, 2, "dnC", "DISK"), (1, 3, "prov", "PROVIDED")],
        ["p1", "p2"],
    )
    assert locs[1] == [
        ("dnA", "DISK"), ("dnB", "DISK"), ("dnC", "DISK"),
        ("p1", "PROVIDED")]


def test_local_hosts_excluded_from_provided_picks(spark):
    locs = _locate(
        spark,
        [(1, 0, "p1", "DISK"), (1, 1, "prov", "PROVIDED")],
        ["p1", "p2", "p3"],
    )
    # p1 hosts a local replica -> excluded; picks are p2, p3
    assert locs[1] == [
        ("p1", "DISK"), ("p2", "PROVIDED"), ("p3", "PROVIDED")]


def test_fallback_when_all_candidates_excluded(spark):
    locs = _locate(
        spark,
        [(1, 0, "p1", "DISK"), (1, 1, "prov", "PROVIDED")],
        ["p1"],
    )
    # every provided dn hosts a local replica: choose(null) fallback,
    # pinned to the smallest provided dn, exactly once
    assert locs[1] == [("p1", "DISK"), ("p1", "PROVIDED")]
