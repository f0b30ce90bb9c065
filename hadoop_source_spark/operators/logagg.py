"""YARN aggregated container-log store: the per-application
LogKey/LogValue record layout as engine-side codecs, the container
log-file index built from decoded entries, and the retention sweep —
the "scan all logs for app X / find failing containers / plan log
retention" surface.

Reference semantics:

- ``hadoop-yarn-common/.../logaggregation/AggregatedLogFormat.java``:
  the aggregated file is a TFile of (LogKey, LogValue) entries.
  - LogKey = ``writeUTF(containerId)`` (``:143-152``); three RESERVED
    meta keys share the key space: ``APPLICATION_ACL``,
    ``APPLICATION_OWNER``, ``VERSION`` (``:86-88``, registered
    ``:100-105``), and the reader's ``next()`` SKIPS them when
    iterating containers (``:683-685``).
  - A container's LogValue (``LogValue.write:231-288``) is a
    concatenation, in lexically sorted file order (``:232``), of
    ``writeUTF(fileName)``, ``writeUTF(String.valueOf(fileLength))``
    (the length is written "as UTF so that it is printable",
    ``:255-258``), then exactly ``fileLength`` raw bytes — a file
    that GREW during upload is truncated to the declared length
    (``:264-274``). The reader loops this triplet until EOF
    (``readContainerLogs:799-866``).
  - Meta values: VERSION = ``writeInt(1)`` (``writeVersion:498-505``),
    APPLICATION_OWNER = ``writeUTF(user)`` (``:507-514``),
    APPLICATION_ACL = ``writeUTF(accessType), writeUTF(acl)`` pairs
    until EOF (``:516-530``; reader ``getApplicationAcls:630-661``).
  - ``writeUTF`` is Java's modified UTF-8 with an unsigned-short
    byte-length prefix (NUL as C0 80, supplementary code points as
    CESU-8 surrogate pairs) — implemented bit-exactly here so decoded
    lengths/bytes match the wire.

- ``AggregatedLogDeletionService.java:54`` (``LogDeletionTask``): the
  retention sweep walks user/{suffix}/bucket/app dirs (dirs whose
  suffix component does not start with the configured bucket suffix
  are never visited, ``run():87-103``) and for every app dir OLDER
  than ``now - retention`` (``deleteAppDirLogs:126-128``):
  - app still RUNNING → delete the individual node log files older
    than the cutoff, keep the dir (``:131-147``);
  - app terminated → delete the whole app dir iff EVERY child file is
    older than the cutoff (``shouldDeleteLogDir:167-181``), else keep
    everything.
  App dirs at-or-newer than the cutoff are untouched (``:127``).

Spark-first: the TFile container framing is the storage layer (the
repo's io.py TFile support / any KV scan); what the engine owns is the
VALUE-stream protocol. The per-blob codecs below are pure Python
(bytes in, rows out) and fan out via ``mapInPandas`` exactly like the
multimodal codecs — one Arrow batch of (key, blob) rows per task, no
driver involvement, linear in total log bytes. The retention sweep is
the closed form of the reference's sequential walk: the only
cross-row dependency is "does the app dir have ANY recent child",
a per-app max — one partial-aggregated groupBy on the app key
(high-cardinality at fleet scale), then a codegen when-chain.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: AggregatedLogFormat.java:86-88 — meta keys the container iterator skips.
RESERVED_KEYS = frozenset({"APPLICATION_ACL", "APPLICATION_OWNER", "VERSION"})

VERSION = 1  # AggregatedLogFormat.java:92


# ------------------------------------------------------------------ wire
# Java DataOutput.writeUTF / DataInput.readUTF (modified UTF-8)

def _mutf8_encode(s: str) -> bytes:
    out = bytearray()
    for ch in s:
        cp = ord(ch)
        if cp == 0:  # NUL is two-byte in modified UTF-8
            out += b"\xc0\x80"
        elif cp < 0x10000:
            out += ch.encode("utf-8") if cp >= 0x80 else bytes((cp,))
        else:  # CESU-8: each surrogate half as a 3-byte sequence
            cp -= 0x10000
            for half in (0xD800 + (cp >> 10), 0xDC00 + (cp & 0x3FF)):
                out += bytes(
                    (
                        0xE0 | (half >> 12),
                        0x80 | ((half >> 6) & 0x3F),
                        0x80 | (half & 0x3F),
                    )
                )
    return bytes(out)


def _mutf8_decode(b: bytes) -> str:
    chars: list[str] = []
    i, n = 0, len(b)
    while i < n:
        c = b[i]
        if c < 0x80:
            chars.append(chr(c))
            i += 1
        elif c >> 5 == 0b110:
            chars.append(chr(((c & 0x1F) << 6) | (b[i + 1] & 0x3F)))
            i += 2
        elif c >> 4 == 0b1110:
            cp = ((c & 0x0F) << 12) | ((b[i + 1] & 0x3F) << 6) | (
                b[i + 2] & 0x3F
            )
            chars.append(chr(cp))
            i += 3
        else:
            raise ValueError(f"bad modified-UTF-8 lead byte {c:#x} at {i}")
    # re-pair CESU-8 surrogates
    s = "".join(chars)
    return s.encode("utf-16", "surrogatepass").decode("utf-16")


def write_utf(s: str) -> bytes:
    """DataOutput.writeUTF: u2 byte-length + modified UTF-8."""
    body = _mutf8_encode(s)
    if len(body) > 0xFFFF:
        raise ValueError(f"writeUTF body too long: {len(body)}")
    return len(body).to_bytes(2, "big") + body


def read_utf(b: bytes, off: int) -> tuple[str, int]:
    """DataInput.readUTF at ``off``; returns (string, next offset)."""
    if off + 2 > len(b):
        raise EOFError("readUTF: truncated length prefix")
    n = int.from_bytes(b[off : off + 2], "big")
    end = off + 2 + n
    if end > len(b):
        raise EOFError("readUTF: truncated body")
    return _mutf8_decode(b[off + 2 : end]), end


# ----------------------------------------------------------- value codecs

def encode_log_value(files: Iterable[tuple[str, bytes]]) -> bytes:
    """LogValue.write: files in sorted name order, each as
    writeUTF(name), writeUTF(str(len)), raw bytes."""
    out = bytearray()
    for name, content in sorted(files, key=lambda t: t[0]):
        out += write_utf(name)
        out += write_utf(str(len(content)))
        out += content
    return bytes(out)


def decode_log_value(blob: bytes) -> list[tuple[str, int, bytes]]:
    """Inverse of :func:`encode_log_value` — the readContainerLogs loop:
    (file_name, declared_length, content) until EOF. A declared length
    past the remaining bytes raises (a truncated upload is a corrupt
    record, not a silent short file)."""
    off, out = 0, []
    while off < len(blob):
        name, off = read_utf(blob, off)
        length_str, off = read_utf(blob, off)
        n = int(length_str)
        if n < 0 or off + n > len(blob):
            raise EOFError(
                f"log file {name!r}: declared {n} bytes, "
                f"{len(blob) - off} remain"
            )
        out.append((name, n, blob[off : off + n]))
        off += n
    return out


def encode_owner(user: str) -> bytes:
    return write_utf(user)


def encode_acls(acls: Iterable[tuple[str, str]]) -> bytes:
    out = bytearray()
    for access_type, acl in acls:
        out += write_utf(access_type)
        out += write_utf(acl)
    return bytes(out)


def encode_version() -> bytes:
    return VERSION.to_bytes(4, "big")  # writeInt(VERSION)


def decode_meta_value(key: str, blob: bytes):
    """Decode a reserved-key value: owner → str, version → int,
    acls → list of (access_type, acl) pairs."""
    if key == "APPLICATION_OWNER":
        s, _ = read_utf(blob, 0)
        return s
    if key == "VERSION":
        return int.from_bytes(blob[:4], "big")
    if key == "APPLICATION_ACL":
        off, pairs = 0, []
        while off < len(blob):
            access_type, off = read_utf(blob, off)
            acl, off = read_utf(blob, off)
            pairs.append((access_type, acl))
        return pairs
    raise KeyError(f"not a reserved key: {key}")


# ------------------------------------------------------- DataFrame ops

_INDEX_SCHEMA = (
    "app_id string, node string, container_id string, file_name string, "
    "file_length bigint, content binary"
)


def container_file_index(entries: DataFrame) -> DataFrame:
    """Decode every (LogKey, LogValue) entry into per-log-file rows:
    (app_id, node, container_id, file_name, file_length, content).
    Reserved meta keys are skipped exactly like LogReader.next()
    (AggregatedLogFormat.java:683-685).

    ``entries``: (app_id string, node string, log_key string,
    value binary). One mapInPandas pass — Arrow batches of blobs in,
    decoded rows out; no driver-side bytes."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for app, node, key, blob in zip(
                pdf["app_id"], pdf["node"], pdf["log_key"], pdf["value"]
            ):
                if key in RESERVED_KEYS:
                    continue
                for name, n, content in decode_log_value(bytes(blob)):
                    rows.append((app, node, key, name, n, content))
            yield pd.DataFrame(
                rows,
                columns=[
                    "app_id", "node", "container_id", "file_name",
                    "file_length", "content",
                ],
            )

    return entries.mapInPandas(decode, _INDEX_SCHEMA)


_META_SCHEMA = (
    "app_id string, node string, owner string, version int, "
    "acls map<string,string>"
)


def application_meta(entries: DataFrame) -> DataFrame:
    """Decode the reserved meta entries of each (app, node) aggregated
    file into one row: owner, version, acl map. Entries for one file
    can land in different partitions, so decode is per-ENTRY (partial
    rows) and the merge is a groupBy on (app, node) — partial
    aggregation keeps the shuffle at one row per aggregated file."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for app, node, key, blob in zip(
                pdf["app_id"], pdf["node"], pdf["log_key"], pdf["value"]
            ):
                if key not in RESERVED_KEYS:
                    continue
                v = decode_meta_value(key, bytes(blob))
                rows.append(
                    (
                        app,
                        node,
                        v if key == "APPLICATION_OWNER" else None,
                        v if key == "VERSION" else None,
                        dict(v) if key == "APPLICATION_ACL" else {},
                    )
                )
            yield pd.DataFrame(
                rows, columns=["app_id", "node", "owner", "version", "acls"]
            )

    partial = entries.mapInPandas(decode, _META_SCHEMA)
    return partial.groupBy("app_id", "node").agg(
        F.max("owner").alias("owner"),
        F.max("version").alias("version"),
        F.map_from_entries(
            F.flatten(F.collect_list(F.map_entries("acls")))
        ).alias("acls"),
    )


# ------------------------------------------------------ retention sweep

def retention_sweep(
    app_dirs: DataFrame,
    log_files: DataFrame,
    cutoff_ms: int,
    suffix: str = "logs",
) -> DataFrame:
    """Plan the AggregatedLogDeletionService pass as one DataFrame:
    every node log file labeled with the action the sweep would take.

    ``app_dirs``: (app_id, user, suffix_name, app_mod_time bigint ms,
    terminated boolean); ``log_files``: (app_id, node_file string,
    file_mod_time bigint ms).

    Actions (the reference's decision table, see module docstring):
    SKIPPED_SUFFIX — the user/{suffix}/bucket walk never reaches the
    dir; KEEP_DIR_RECENT — app dir at/after the cutoff, untouched;
    DELETE_FILE / KEEP_FILE_RECENT — running app, per-file decision;
    DELETE_APP_DIR — terminated app, every child old, dir removed
    recursively; KEEP_DIR_HAS_RECENT — terminated app saved by one
    recent child."""
    from pyspark.sql import Window

    # per-app "any recent child" as an unbounded window — same shuffle
    # key as the app_dirs join, so the exchange is reused; app_dirs is
    # app-count-sized (can be millions fleet-wide) so no forced
    # broadcast — AQE picks the strategy per actual size
    latest = F.max("file_mod_time").over(Window.partitionBy("app_id"))
    j = log_files.withColumn("__latest_child", latest).join(
        app_dirs, "app_id", "inner"
    )
    cutoff = F.lit(cutoff_ms).cast("long")
    old_file = F.col("file_mod_time") < cutoff
    action = (
        F.when(
            ~F.col("suffix_name").startswith(suffix),
            F.lit("SKIPPED_SUFFIX"),
        )
        .when(F.col("app_mod_time") >= cutoff, F.lit("KEEP_DIR_RECENT"))
        .when(
            ~F.col("terminated"),
            F.when(old_file, F.lit("DELETE_FILE")).otherwise(
                F.lit("KEEP_FILE_RECENT")
            ),
        )
        .when(
            F.col("__latest_child") < cutoff, F.lit("DELETE_APP_DIR")
        )
        .otherwise(F.lit("KEEP_DIR_HAS_RECENT"))
    )
    return j.select(
        "app_id",
        "user",
        "node_file",
        "file_mod_time",
        action.alias("action"),
    )
