"""WARC/WET codec pins (ISO 28500 record framing; llmops/warc)."""

from __future__ import annotations

import pytest

from hadoop_source_spark.llmops import warc


def test_round_trip_multibyte_payload():
    payload = "héllo wörld — ✓".encode("utf-8")
    blob = warc.encode_record(
        [("WARC-Type", "conversion"), ("WARC-Target-URI", "http://x/y")],
        payload,
    )
    [rec] = list(warc.decode_records(blob))
    assert rec["payload"] == payload
    # Content-Length counts BYTES, not characters
    assert int(rec["content-length"]) == len(payload) > len("héllo wörld — ✓".replace("é", "e"))
    assert rec["warc-type"] == "conversion"
    assert rec["warc-target-uri"] == "http://x/y"


def test_length_framing_beats_pattern_split():
    # the payload embeds a full fake record; a pattern-based splitter
    # would see three records, the length-honoring reader sees two
    evil = (
        b"WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    )
    blob = warc.encode_record([("WARC-Type", "conversion")], evil)
    blob += warc.encode_record([("WARC-Type", "conversion")], b"tail")
    recs = list(warc.decode_records(blob))
    assert len(recs) == 2
    assert recs[0]["payload"] == evil
    assert recs[1]["payload"] == b"tail"


def test_case_insensitive_headers_and_folding():
    blob = (
        b"WARC/1.0\r\n"
        b"warc-TYPE: conversion\r\n"
        b"WARC-Target-URI: http://a/\r\n"
        b"\t b\r\n"                       # folded continuation
        b"CONTENT-length: 2\r\n"
        b"\r\n"
        b"ok\r\n\r\n"
    )
    [rec] = list(warc.decode_records(blob))
    assert rec["warc-type"] == "conversion"
    assert rec["warc-target-uri"] == "http://a/ b"
    assert rec["payload"] == b"ok"


@pytest.mark.parametrize(
    "blob",
    [
        b"WARC/2.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n",     # bad magic
        b"WARC/1.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n",          # no length
        b"WARC/1.0\r\nContent-Length: 10\r\n\r\nshort",       # truncated
        b"WARC/1.0\r\nContent-Length: 2\r\n\r\nokXX",         # no CRLFCRLF
    ],
)
def test_malformed_raises(blob):
    with pytest.raises(ValueError):
        list(warc.decode_records(blob))


def test_wet_file_order_and_spark_decode(spark):
    docs = [
        ("http://a/1", "urn:uuid:1", "one".encode()),
        ("http://a/2", "urn:uuid:2", "two två".encode()),
        ("http://a/3", "urn:uuid:3", b""),                # empty payload
    ]
    blob = warc.encode_wet_file(7, docs)
    files = spark.createDataFrame(
        [(7, bytearray(blob))], "file_id long, data binary"
    )
    rows = sorted(
        warc.wet_record_table(files).collect(), key=lambda r: r["rec_idx"]
    )
    assert [r["warc_type"] for r in rows] == [
        "warcinfo", "conversion", "conversion", "conversion",
    ]
    assert rows[0]["target_uri"] is None
    assert bytes(rows[0]["payload"]) == warc.WARCINFO_PAYLOAD
    assert [r["target_uri"] for r in rows[1:]] == [
        "http://a/1", "http://a/2", "http://a/3",
    ]
    assert rows[2]["content_length"] == len("two två".encode())
    assert rows[3]["content_length"] == 0


def test_negative_content_length_raises():
    blob = b"WARC/1.0\r\nContent-Length: -4\r\n\r\n\r\n\r\n"
    with pytest.raises(ValueError, match="negative Content-Length"):
        list(warc.decode_records(blob))
