"""Aggregated container-log format pins (AggregatedLogFormat.java /
AggregatedLogDeletionService.java) — wire bytes hand-built per the
reference's writeUTF/writeInt framing, like webhdfs's literal bodies."""

from __future__ import annotations

import pytest

from hadoop_source_spark.operators import logagg as la


# ------------------------------------------------------------- writeUTF

def test_write_utf_matches_java_bytes():
    # DataOutputStream.writeUTF: u2 big-endian byte length + modified
    # UTF-8 (NUL → C0 80, supplementary → CESU-8 surrogate pair)
    assert la.write_utf("ab") == b"\x00\x02ab"
    assert la.write_utf("") == b"\x00\x00"
    assert la.write_utf("\x00") == b"\x00\x02\xc0\x80"
    assert la.write_utf("é") == b"\x00\x02\xc3\xa9"
    # U+1F600 → surrogates D83D DE00 → ED A0 BD ED B8 80
    assert la.write_utf("\U0001f600") == b"\x00\x06\xed\xa0\xbd\xed\xb8\x80"


@pytest.mark.parametrize(
    "s", ["", "plain", "\x00mid\x00", "héllo wörld", "mixé\U0001f600z"]
)
def test_utf_round_trip(s):
    b = la.write_utf(s)
    got, off = la.read_utf(b, 0)
    assert got == s and off == len(b)


def test_read_utf_truncation_raises():
    with pytest.raises(EOFError):
        la.read_utf(b"\x00", 0)  # short length prefix
    with pytest.raises(EOFError):
        la.read_utf(b"\x00\x05ab", 0)  # short body


# ------------------------------------------------------------ LogValue

def test_log_value_wire_layout_is_sorted_triplets():
    # LogValue.write:231-288 — lexically sorted file order, each file
    # as writeUTF(name), writeUTF(str(len)) ("printable" length), bytes
    blob = la.encode_log_value([("stdout", b"hello"), ("stderr", b"")])
    assert blob == (
        b"\x00\x06stderr" + b"\x00\x010"
        + b"\x00\x06stdout" + b"\x00\x015" + b"hello"
    )


def test_log_value_round_trip_and_truncation():
    files = [("syslog", b"a\nb\n"), ("stdout", bytes(range(256)))]
    got = la.decode_log_value(la.encode_log_value(files))
    assert got == [
        ("stdout", 256, bytes(range(256))),
        ("syslog", 4, b"a\nb\n"),
    ]
    blob = la.encode_log_value([("stdout", b"hello")])
    with pytest.raises(EOFError):  # declared 5, only 3 remain
        la.decode_log_value(blob[:-2])


def test_meta_values():
    # writeVersion:498-505 — writeInt(1)
    assert la.encode_version() == b"\x00\x00\x00\x01"
    assert la.decode_meta_value("VERSION", la.encode_version()) == 1
    assert (
        la.decode_meta_value("APPLICATION_OWNER", la.encode_owner("alice"))
        == "alice"
    )
    pairs = [("VIEW_APP", "alice,bob admins"), ("MODIFY_APP", "alice")]
    assert (
        la.decode_meta_value("APPLICATION_ACL", la.encode_acls(pairs))
        == pairs
    )
    with pytest.raises(KeyError):
        la.decode_meta_value("container_1_01_000001", b"")


# ----------------------------------------------------- DataFrame seam

def _entries(spark):
    rows = [
        ("app_1", "nm0", "VERSION", la.encode_version()),
        ("app_1", "nm0", "APPLICATION_OWNER", la.encode_owner("alice")),
        (
            "app_1",
            "nm0",
            "APPLICATION_ACL",
            la.encode_acls([("VIEW_APP", "*")]),
        ),
        (
            "app_1",
            "nm0",
            "container_1_01_000001",
            la.encode_log_value(
                [("stdout", b"out\n"), ("stderr", b"ERROR x\n")]
            ),
        ),
        (
            "app_1",
            "nm0",
            "container_1_01_000002",
            la.encode_log_value([("stdout", b"")]),
        ),
    ]
    return spark.createDataFrame(
        rows, "app_id string, node string, log_key string, value binary"
    )


def test_container_index_skips_reserved_keys(spark):
    idx = la.container_file_index(_entries(spark)).collect()
    # LogReader.next:683-685 — meta keys never surface as containers
    assert {r["container_id"] for r in idx} == {
        "container_1_01_000001",
        "container_1_01_000002",
    }
    got = {
        (r["container_id"], r["file_name"]): (
            r["file_length"],
            bytes(r["content"]),
        )
        for r in idx
    }
    assert got[("container_1_01_000001", "stderr")] == (8, b"ERROR x\n")
    assert got[("container_1_01_000002", "stdout")] == (0, b"")


def test_application_meta_decodes_reserved_entries(spark):
    meta = la.application_meta(_entries(spark)).collect()
    assert len(meta) == 1
    m = meta[0]
    assert (m["app_id"], m["node"]) == ("app_1", "nm0")
    assert m["owner"] == "alice" and m["version"] == 1
    assert dict(m["acls"]) == {"VIEW_APP": "*"}


# ------------------------------------------------------ retention sweep

def test_retention_sweep_decision_table(spark):
    C = 1_000_000  # cutoff ms
    app_dirs = spark.createDataFrame(
        [
            # (app_id, user, suffix_name, app_mod_time, terminated)
            ("a_skip", "u1", "bucket-oldfmt", C - 10, True),
            ("a_recent", "u1", "logs", C + 10, True),
            ("a_running", "u2", "logs-tfile", C - 10, False),
            ("a_done_old", "u2", "logs", C - 10, True),
            ("a_done_live", "u3", "logs", C - 10, True),
        ],
        "app_id string, user string, suffix_name string, "
        "app_mod_time long, terminated boolean",
    )
    log_files = spark.createDataFrame(
        [
            ("a_skip", "f1", C - 99),
            ("a_recent", "f2", C - 99),  # old file, but dir is recent
            ("a_running", "f3", C - 99),  # old → DELETE_FILE
            ("a_running", "f4", C + 99),  # recent → KEEP_FILE_RECENT
            ("a_done_old", "f5", C - 99),
            ("a_done_old", "f6", C - 1),
            ("a_done_live", "f7", C - 99),  # saved by the sibling below
            ("a_done_live", "f8", C + 99),
        ],
        "app_id string, node_file string, file_mod_time long",
    )
    out = {
        r["node_file"]: r["action"]
        for r in la.retention_sweep(
            app_dirs, log_files, cutoff_ms=C, suffix="logs"
        ).collect()
    }
    assert out == {
        "f1": "SKIPPED_SUFFIX",
        "f2": "KEEP_DIR_RECENT",
        "f3": "DELETE_FILE",
        "f4": "KEEP_FILE_RECENT",
        "f5": "DELETE_APP_DIR",
        "f6": "DELETE_APP_DIR",
        "f7": "KEEP_DIR_HAS_RECENT",
        "f8": "KEEP_DIR_HAS_RECENT",
    }
