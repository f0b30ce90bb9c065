"""Indexed aggregated-log (ifile) format pins
(LogAggregationIndexedFileController.java: initializeWriter:160-239,
initializeWriterInRolling:253-349, postWrite:425-437,
parseCheckSumFiles:705-744, loadIndexedLogsMeta:842-898)."""

from __future__ import annotations

import hashlib

import pytest

from hadoop_source_spark.operators import ifile
from hadoop_source_spark.operators.ifile import (
    IndexedLogWriter,
    MetaLoadError,
    create_uuid,
    decode_checksum,
    encode_checksum,
    iter_entries,
    load_indexed_logs_meta,
)


def _entries(cycle, n=3):
    return [
        (cycle * 100 + i, f"container_{i}", "stdout",
         f"c{cycle}e{i}-payload".encode(), 1000 + i)
        for i in range(n)
    ]


def test_uuid_is_sha256_of_app_id():
    u = create_uuid("application_1")
    assert u == hashlib.sha256(b"application_1").digest()
    assert len(u) == ifile.UUID_LENGTH == 32


def test_checksum_roundtrip_and_short_read():
    blob = encode_checksum("nm5_8041", 12345)
    assert decode_checksum(blob) == ("nm5_8041", 12345)
    # parseCheckSumFiles: short name read -> skip (actual != nameLength)
    assert decode_checksum(blob[:6]) is None
    assert decode_checksum(b"") is None


def test_single_cycle_layout_and_roundtrip():
    w = IndexedLogWriter("application_1", "nm0_8041")
    w.append_cycle(_entries(0), upload_ts=7)
    blob = bytes(w.blob)
    assert blob[:32] == create_uuid("application_1")
    assert blob[-32:] == create_uuid("application_1")
    meta = load_indexed_logs_meta(blob, -1, create_uuid("application_1"))
    got = list(iter_entries(blob, meta))
    assert [(c, m["entryId"]) for c, m, _, _ in got] == [
        ("container_0", 0), ("container_1", 1), ("container_2", 2)]
    assert all(raw == f"c0e{i}-payload".encode()
               for i, (_, _, _, raw) in enumerate(got))
    assert all(ts == 7 for _, _, ts, _ in got)


def test_multi_cycle_accumulates_meta_and_newline_gap():
    w = IndexedLogWriter("app", "nm1")
    w.append_cycle(_entries(0), upload_ts=0)
    end0 = w.end_of_last_tail
    w.append_cycle(_entries(1), upload_ts=1)
    blob = bytes(w.blob)
    # re-open writes the 1-byte cursor-mover before cycle-1 data
    assert blob[end0:end0 + 1] == b"\n"
    meta = load_indexed_logs_meta(blob, -1, create_uuid("app"))
    assert len(meta["logMetas"]) == 2  # postWrite appends ALL metas
    assert len(list(iter_entries(blob, meta))) == 6
    # the intermediate tail is still readable at end0 (recovery path)
    meta0 = load_indexed_logs_meta(blob, end0, create_uuid("app"))
    assert len(meta0["logMetas"]) == 1
    assert len(list(iter_entries(blob, meta0))) == 3


def test_crash_recovery_via_checksum_end_index():
    w = IndexedLogWriter("app", "nm2")
    w.append_cycle(_entries(0), upload_ts=0)
    end = w.crash(b"partial-cycle-1-bytes-never-finished")
    blob = bytes(w.blob)
    # full-length read would hit garbage; the checksum's endIndex
    # recovers the last good tail
    with pytest.raises(MetaLoadError):
        load_indexed_logs_meta(blob, -1, create_uuid("app"))
    meta = load_indexed_logs_meta(blob, end, create_uuid("app"))
    assert len(list(iter_entries(blob, meta))) == 3


def test_end_index_zero_means_no_meta():
    w = IndexedLogWriter("app", "nm3")
    w.append_cycle(_entries(0), upload_ts=0)
    assert load_indexed_logs_meta(bytes(w.blob), 0) is None


def test_uuid_mismatch_rejects():
    w = IndexedLogWriter("app", "nm4")
    w.append_cycle(_entries(0), upload_ts=0)
    with pytest.raises(MetaLoadError, match="UUID"):
        load_indexed_logs_meta(bytes(w.blob), -1, create_uuid("other"))
    w.corrupt_uuid()
    with pytest.raises(MetaLoadError, match="UUID"):
        load_indexed_logs_meta(bytes(w.blob), -1, create_uuid("app"))


def test_gzip_per_file_blocks():
    w = IndexedLogWriter("app", "nm5", compress="gzip")
    payload = b"z" * 5000
    w.append_cycle([(1, "c", "syslog", payload, 9)], upload_ts=0)
    blob = bytes(w.blob)
    meta = load_indexed_logs_meta(blob, -1, create_uuid("app"))
    (cid, m, _, raw), = iter_entries(blob, meta)
    assert raw == payload
    assert m["fileSize"] == 5000
    assert m["fileCompressedSize"] < 200  # stored compressed


def test_read_aggregated_logs_plan(spark):
    rows = []
    uuid_app = "application_7"
    # healthy 2-cycle file
    w = IndexedLogWriter(uuid_app, "nmA_8041")
    w.append_cycle(_entries(0, 2), upload_ts=0)
    w.append_cycle(_entries(1, 2), upload_ts=1)
    rows.append(("dir1", uuid_app, "nmA_8041", bytes(w.blob)))
    # crashed file + its leftover checksum
    w2 = IndexedLogWriter(uuid_app, "nmB_8041")
    w2.append_cycle(_entries(0, 2), upload_ts=0)
    end = w2.crash(b"junk")
    rows.append(("dir1", uuid_app, "nmB_8041", bytes(w2.blob)))
    rows.append(("dir1", uuid_app, "nmB_8041-checksum",
                 encode_checksum("nmB_8041", end)))
    # stale checksum naming a file that no longer exists: ignored
    rows.append(("dir1", uuid_app, "nmold-checksum",
                 encode_checksum("nmGone_8041", 10)))
    # endIndex=0 checksum -> NO_META
    w3 = IndexedLogWriter(uuid_app, "nmC_8041")
    w3.append_cycle(_entries(0, 1), upload_ts=0)
    rows.append(("dir1", uuid_app, "nmC_8041", bytes(w3.blob)))
    rows.append(("dir1", uuid_app, "nmC_8041-checksum",
                 encode_checksum("nmC_8041", 0)))
    # corrupted uuid -> BAD_UUID; tmp file -> ignored entirely
    w4 = IndexedLogWriter(uuid_app, "nmD_8041")
    w4.append_cycle(_entries(0, 1), upload_ts=0)
    w4.corrupt_uuid()
    rows.append(("dir1", uuid_app, "nmD_8041", bytes(w4.blob)))
    rows.append(("dir1", uuid_app, "nmE_8041.tmp", b"\x00garbage"))

    files = spark.createDataFrame(
        rows, "dir_key string, app_id string, file_name string, blob binary"
    )
    out = ifile.read_aggregated_logs(files).collect()
    by_file = {}
    for r in out:
        by_file.setdefault(r["node_file"], []).append(r)
    assert len(by_file["nmA_8041"]) == 4
    assert all(r["status"] == "VISIBLE" and not r["recovered"]
               for r in by_file["nmA_8041"])
    # crashed file: only cycle-0 entries, via the checksum
    b_rows = by_file["nmB_8041"]
    assert sorted(r["entry_id"] for r in b_rows) == [0, 1]
    assert all(r["recovered"] and r["status"] == "VISIBLE" for r in b_rows)
    (c_row,) = by_file["nmC_8041"]
    assert (c_row["status"], c_row["recovered"]) == ("NO_META", True)
    assert c_row["entry_id"] is None
    (d_row,) = by_file["nmD_8041"]
    assert (d_row["status"], d_row["recovered"]) == ("BAD_UUID", False)
    assert "nmE_8041.tmp" not in by_file
    # md5 is over the decoded bytes
    a0 = next(r for r in by_file["nmA_8041"] if r["entry_id"] == 0)
    assert a0["content_md5"] == hashlib.md5(b"c0e0-payload").hexdigest()
    assert a0["file_size"] == len(b"c0e0-payload")
