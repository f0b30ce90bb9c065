"""WARC/WET record codecs: the stage-0 ingestion format of
CCNet / RefinedWeb-style web corpora (beyond the reference — public
ISO 28500 / WARC 1.0 format; the engine-owns-decoding stance of
`operators/webhdfs.py` and `operators/logagg.py`).

Wire layout (one record)::

    WARC/1.0\\r\\n
    WARC-Type: conversion\\r\\n
    WARC-Target-URI: http://...\\r\\n
    ...more headers...\\r\\n
    Content-Length: N\\r\\n
    \\r\\n
    <exactly N payload bytes>\\r\\n\\r\\n

Framing is LENGTH-DELIMITED: the payload may itself contain
``WARC/1.0`` lines, so a pattern split is wrong by construction —
the reader MUST honor Content-Length (the classic WARC-parsing bug;
pinned in tests). A WET file is a `warcinfo` record followed by one
`conversion` record per document. Header names are case-insensitive
(RFC-style); continuation lines (leading SP/HT) fold into the
previous header value.

Spark seam: files are opaque binary blobs in a DataFrame;
`wet_record_table` fans the decoder out via mapInPandas (Arrow
batches, bytes never on the driver) — one decode pass, no shuffle.
Malformed input raises rather than yielding partial records.
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import DataFrame

CRLF = b"\r\n"
_MAGICS = (b"WARC/1.0", b"WARC/1.1")


def encode_record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    """One WARC record; Content-Length is computed, not caller-set."""
    out = [b"WARC/1.0", CRLF]
    for k, v in headers:
        out += [k.encode("utf-8"), b": ", v.encode("utf-8"), CRLF]
    out += [b"Content-Length: ", str(len(payload)).encode("ascii"), CRLF]
    out += [CRLF, payload, CRLF, CRLF]
    return b"".join(out)


WARCINFO_PAYLOAD = b"software: hadoop-source-spark 1.0"


def encode_wet_file(
    file_id: int, docs: Iterable[tuple[str, str, bytes]]
) -> bytes:
    """A WET file: a warcinfo record, then one conversion record per
    (target_uri, record_id, payload) doc, in input order."""
    parts = [
        encode_record(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Record-ID", f"urn:uuid:file-{file_id}"),
                ("WARC-Date", "2026-01-01T00:00:00Z"),
                ("Content-Type", "application/warc-fields"),
            ],
            WARCINFO_PAYLOAD,
        )
    ]
    for uri, rid, payload in docs:
        parts.append(
            encode_record(
                [
                    ("WARC-Type", "conversion"),
                    ("WARC-Target-URI", uri),
                    ("WARC-Record-ID", rid),
                    ("WARC-Date", "2026-01-01T00:00:00Z"),
                    ("Content-Type", "text/plain"),
                ],
                payload,
            )
        )
    return b"".join(parts)


def decode_records(blob: bytes) -> Iterator[dict]:
    """Parse every record in a WET/WARC blob, in order.

    Yields dicts with lowercase header keys plus ``payload``.
    Raises ValueError on bad magic, missing Content-Length, short
    payload, or a missing record terminator — loud, never partial."""
    pos, n = 0, len(blob)
    while pos < n:
        eol = blob.find(CRLF, pos)
        if eol < 0 or blob[pos:eol] not in _MAGICS:
            raise ValueError(
                f"bad WARC magic at byte {pos}: {blob[pos:pos + 12]!r}"
            )
        pos = eol + 2
        headers: dict[str, str] = {}
        last_key: str | None = None
        while True:
            eol = blob.find(CRLF, pos)
            if eol < 0:
                raise ValueError("unterminated header block")
            line = blob[pos:eol]
            pos = eol + 2
            if not line:
                break
            if line[:1] in (b" ", b"\t"):  # folded continuation
                if last_key is None:
                    raise ValueError("continuation line before any header")
                headers[last_key] += " " + line.strip().decode("utf-8")
                continue
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed header line: {line!r}")
            last_key = k.decode("utf-8").strip().lower()
            headers[last_key] = v.decode("utf-8").strip()
        if "content-length" not in headers:
            raise ValueError("record without Content-Length")
        clen = int(headers["content-length"])
        if clen < 0:
            raise ValueError(f"negative Content-Length: {clen}")
        if pos + clen + 4 > n:
            raise ValueError("truncated record payload")
        payload = blob[pos : pos + clen]
        pos += clen
        if blob[pos : pos + 4] != CRLF + CRLF:
            raise ValueError("missing record terminator")
        pos += 4
        yield {**headers, "payload": payload}


RECORD_SCHEMA = (
    "file_id long, rec_idx long, warc_type string, record_id string,"
    " target_uri string, content_type string, content_length long,"
    " payload binary"
)


def wet_record_table(
    files: DataFrame, file_col: str = "file_id", blob_col: str = "data"
) -> DataFrame:
    """Decode a DataFrame of WET file blobs into one row per record
    (rec_idx = 0-based position in the file, warcinfo included)."""

    def _decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fid, blob in zip(pdf[file_col], pdf[blob_col]):
                for i, rec in enumerate(decode_records(bytes(blob))):
                    rows.append(
                        (
                            fid,
                            i,
                            rec.get("warc-type"),
                            rec.get("warc-record-id"),
                            rec.get("warc-target-uri"),
                            rec.get("content-type"),
                            int(rec["content-length"]),
                            rec["payload"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_id", "rec_idx", "warc_type", "record_id",
                    "target_uri", "content_type", "content_length",
                    "payload",
                ],
            )

    return files.mapInPandas(_decode, RECORD_SCHEMA)
