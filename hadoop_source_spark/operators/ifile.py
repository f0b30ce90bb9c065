"""Indexed aggregated-log file (ifile) format: the rolling log
aggregation controller every modern YARN cluster writes container
logs through.

Reference semantics (`hadoop-yarn-common/.../filecontroller/ifile/
LogAggregationIndexedFileController.java`):

- An aggregated file opens with a 32-byte UUID = SHA-256 of the
  application id (``createUUID:1277-1285``, written first at
  ``initializeWriter:203-206``). Each aggregation cycle appends the
  raw (per-log-file optionally compressed) bytes of every container
  log file, then ``postWrite:425-437`` appends the FULL accumulated
  meta ("always aggregate the previous logsMeta, and append them
  together at the end of the file"), a 4-byte meta length, and the
  UUID again. Re-opening for the next cycle writes a 1-byte ``\\n``
  cursor-mover first (``initializeWriter:216-222``).
- Per-log-file meta (``IndexedFileLogMeta:1017``): containerId,
  fileName, fileSize (the RAW length), fileCompressedSize,
  startIndex (position in the aggregated file), lastModifiedTime.
- The rolling writer protects each cycle with a ``-checksum`` file
  (``initializeWriterInRolling:330-346``): writeInt(name length) +
  the aggregated file name UTF-8 + writeLong(file length BEFORE this
  cycle). On success the checksum is deleted (``postWrite:433-436``);
  a crash leaves it behind. Rollover (file length past the cap,
  ``isRollover:1265-1270``) clears the accumulated meta and starts a
  fresh ``name_<timestamp>`` file (:303-318).
- Read path (``readAggregatedLogs:492-...``):
  ``parseCheckSumFiles:705-744`` keys recovered (name, endIndex)
  pairs BY THE RECORDED NAME — a stale checksum naming a different
  file simply never matches; ``getNodeLogFileToRead:747-763`` skips
  ``.tmp`` and ``-checksum`` entries;
  ``loadIndexedLogsMeta:842-898``: endIndex 0 means no valid meta
  (return null → file skipped), endIndex < 0 means read the tail at
  the physical length; seek(end - 4 - 32) for the meta length, the
  trailing UUID must equal SHA-256(appId) or the file is rejected;
  the meta blob sits at end - len - 36. Any load failure skips the
  file (:530-540).

Spark-first: encode/decode run as Arrow-batched ``mapInPandas`` over
the blob column — bytes never visit the driver; the checksum
recovery is one (dir, name)-keyed join. The meta blob is serialized
as canonical JSON rather than Java object serialization (the
reference's ``SerializationUtils.serialize`` wire bytes are not
reproducible outside the JVM); offsets, tail layout, checksum bytes
and all recovery semantics match the reference.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import struct
from typing import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UUID_LENGTH = 32
CHECK_SUM_FILE_SUFFIX = "-checksum"
TMP_FILE_SUFFIX = ".tmp"
_TAIL = 4 + UUID_LENGTH  # writeInt(len) + uuid (postWrite:429-431)

VISIBLE = "VISIBLE"
NO_META = "NO_META"
BAD_UUID = "BAD_UUID"


def create_uuid(app_id: str) -> bytes:
    """SHA-256 of the application id string (createUUID:1277-1285)."""
    return hashlib.sha256(app_id.encode("utf-8")).digest()


def encode_checksum(file_name: str, end_index: int) -> bytes:
    """writeInt(name length) + name UTF-8 + writeLong(endIndex)
    (initializeWriterInRolling:336-342)."""
    b = file_name.encode("utf-8")
    return struct.pack(">i", len(b)) + b + struct.pack(">q", end_index)


def decode_checksum(blob: bytes) -> tuple[str, int] | None:
    """parseCheckSumFiles:723-732: a short read of the name (or any
    parse failure) skips the checksum file."""
    try:
        (name_len,) = struct.unpack(">i", blob[:4])
        name_bytes = blob[4 : 4 + name_len]
        if len(name_bytes) != name_len or name_len <= 0:
            return None
        (end,) = struct.unpack(">q", blob[4 + name_len : 12 + name_len])
        return name_bytes.decode("utf-8"), end
    except (struct.error, UnicodeDecodeError):
        return None


def _serialize_meta(meta: dict) -> bytes:
    return json.dumps(meta, sort_keys=True, separators=(",", ":")).encode(
        "utf-8"
    )


def _gzip_block(data: bytes) -> bytes:
    return gzip.compress(data, compresslevel=6, mtime=0)


class IndexedLogWriter:
    """Builds one aggregated log file the way the controller's
    initializeWriter/write/postWrite sequence does.

    ``append_cycle`` = one aggregation cycle: the optional re-open
    ``\\n`` (initializeWriter:216-222), every entry's (optionally
    per-file compressed, IndexedFileOutputStreamState) bytes, then
    the accumulated-meta tail (postWrite:425-431). ``crash`` =
    initializeWriter ran for the next cycle (the ``\\n`` plus some
    data landed) but postWrite never did — the tail the reader
    recovers through the checksum's endIndex is the previous one."""

    def __init__(self, app_id: str, node_file: str, *,
                 user: str = "yarn", compress: str = "none"):
        self.uuid = create_uuid(app_id)
        self.node_file = node_file
        self.compress = compress
        self.blob = bytearray(self.uuid)
        self.meta = {
            "version": 1,
            "user": user,
            "compressName": compress,
            "nodeId": node_file,
            "logMetas": [],
        }
        self.end_of_last_tail = len(self.blob)

    def _append_tail(self) -> None:
        b = _serialize_meta(self.meta)
        self.blob += b
        self.blob += struct.pack(">i", len(b))
        self.blob += self.uuid
        self.end_of_last_tail = len(self.blob)

    def append_cycle(
        self,
        entries: Iterable[tuple[int, str, str, bytes, int]],
        upload_ts: int,
    ) -> None:
        """entries: (entry_id, container_id, file_name, content
        bytes, last_modified)."""
        if self.meta["logMetas"]:
            self.blob += b"\n"
        cycle: dict = {
            "uploadTimeStamp": upload_ts,
            "remoteNodeFile": self.node_file,
            "logMetas": {},
        }
        for entry_id, container_id, file_name, content, mtime in entries:
            data = (
                _gzip_block(content) if self.compress == "gzip" else content
            )
            start = len(self.blob)
            self.blob += data
            cycle["logMetas"].setdefault(container_id, []).append(
                {
                    "entryId": entry_id,
                    "fileName": file_name,
                    "fileSize": len(content),
                    "fileCompressedSize": len(data),
                    "startIndex": start,
                    "lastModifiedTime": mtime,
                }
            )
        self.meta["logMetas"].append(cycle)
        self._append_tail()

    def crash(self, partial: bytes) -> int:
        """Simulate a cycle that began (re-open ``\\n`` + data) but
        never reached postWrite; returns the endIndex the checksum
        recorded at cycle start (the pre-``\\n`` length,
        initializeWriterInRolling:321-329)."""
        end = self.end_of_last_tail
        self.blob += b"\n" + partial
        return end

    def corrupt_uuid(self) -> None:
        self.blob[-1] ^= 0xFF


class MetaLoadError(Exception):
    pass


def load_indexed_logs_meta(
    blob: bytes, end: int = -1, expected_uuid: bytes | None = None
) -> dict | None:
    """loadIndexedLogsMeta:842-898: end==0 → null (the checksum said
    nothing of this file is valid); end<0 → physical length; the
    trailing UUID must match SHA-256(appId) or the load fails."""
    if end == 0:
        return None
    file_length = len(blob) if end < 0 else end
    if file_length < UUID_LENGTH + _TAIL:
        raise MetaLoadError("file shorter than uuid + tail")
    (offset,) = struct.unpack(
        ">i", blob[file_length - _TAIL : file_length - UUID_LENGTH]
    )
    uuid_read = blob[file_length - UUID_LENGTH : file_length]
    if expected_uuid is not None and uuid_read != expected_uuid:
        raise MetaLoadError("The UUID is not correct")
    start = file_length - offset - _TAIL
    if offset <= 0 or start < UUID_LENGTH:
        raise MetaLoadError("bad meta offset")
    try:
        return json.loads(blob[start : file_length - _TAIL])
    except ValueError as exc:  # pragma: no cover - corrupt meta
        raise MetaLoadError(str(exc)) from exc


def iter_entries(
    blob: bytes, meta: dict
) -> Iterator[tuple[str, dict, int, bytes]]:
    """Yield (container_id, file meta, upload_ts, raw content bytes)
    per visible entry, decompressing per the meta's compressName the
    way the read path wraps the block in the codec's decompressor."""
    compress = meta.get("compressName", "none")
    for cycle in meta["logMetas"]:
        ts = cycle["uploadTimeStamp"]
        for container_id, metas in cycle["logMetas"].items():
            for m in metas:
                raw = blob[
                    m["startIndex"] : m["startIndex"]
                    + m["fileCompressedSize"]
                ]
                if compress == "gzip":
                    raw = gzip.decompress(raw)
                yield container_id, m, ts, raw


_CHECK_SCHEMA = "dir_key string, rec_name string, end_index long"
_OUT_SCHEMA = (
    "entry_id long, app_id string, node_file string,"
    " container_id string, log_file string, upload_ts long,"
    " file_size long, content_md5 string, last_modified long,"
    " recovered boolean, status string"
)


def read_aggregated_logs(files: DataFrame) -> DataFrame:
    """Decode a table of aggregated-log physical files the way
    readAggregatedLogs does.

    ``files``: (dir_key string — the app's remote log dir, app_id
    string, file_name string, blob binary); checksum files travel in
    the same table under their ``-checksum`` names, exactly as they
    sit in the remote dir.

    Returns one row per visible log-file entry (status VISIBLE) plus
    one row per skipped aggregated file (status NO_META for a
    checksum-invalidated file, BAD_UUID for a UUID mismatch);
    ``recovered`` marks files whose read went through a matched
    checksum endIndex. ``.tmp`` and ``-checksum`` names are never
    read as logs (getNodeLogFileToRead:747-763).

    Scale: one ``applyInPandas`` per remote app dir — the grain the
    reference read path walks (``readAggregatedLogs`` lists one app's
    dir) and the grain the old checksum join shuffled to anyway.
    Checksum parse and blob decode happen in the same pass, so the
    (possibly expensive) lineage producing ``files`` is evaluated
    once, not once per branch; bytes stay on executors; no
    driver-side iteration. A dir's file count is bounded (one file
    per NM per rollover), so the per-group pandas frame is
    control-plane-sized even at 100 TB corpus scale."""
    import pandas as pd

    col_names = [c.strip().split(" ")[0] for c in _OUT_SCHEMA.split(",")]

    def decode_dir(pdf: pd.DataFrame) -> pd.DataFrame:
        # parseCheckSumFiles: recovered (name, endIndex) keyed by the
        # RECORDED name; a stale checksum naming another file never
        # matches. Kept as lists to preserve the old left-join
        # semantics exactly (k matching checksum rows -> k decodes).
        checks: dict[str, list[int]] = {}
        for name, blob in zip(pdf["file_name"], pdf["blob"]):
            if name.endswith(CHECK_SUM_FILE_SUFFIX):
                rec = decode_checksum(bytes(blob))
                if rec is not None and rec[0]:
                    checks.setdefault(rec[0], []).append(rec[1])
        rows = []
        for app_id, name, blob in zip(
            pdf["app_id"], pdf["file_name"], pdf["blob"]
        ):
            if name.endswith(CHECK_SUM_FILE_SUFFIX) or name.endswith(
                TMP_FILE_SUFFIX
            ):
                continue
            for end in checks.get(name, [None]):
                blob_b = bytes(blob)
                recovered = end is not None
                end_index = int(end) if recovered else -1
                try:
                    meta = load_indexed_logs_meta(
                        blob_b, end_index, create_uuid(app_id)
                    )
                except MetaLoadError:
                    rows.append(
                        (None, app_id, name, None, None, None, None,
                         None, None, recovered, BAD_UUID)
                    )
                    continue
                if meta is None:
                    rows.append(
                        (None, app_id, name, None, None, None, None,
                         None, None, recovered, NO_META)
                    )
                    continue
                for cid, m, ts, raw in iter_entries(blob_b, meta):
                    rows.append(
                        (
                            m["entryId"], app_id, name, cid,
                            m["fileName"], ts, m["fileSize"],
                            hashlib.md5(raw).hexdigest(),
                            m["lastModifiedTime"], recovered, VISIBLE,
                        )
                    )
        return pd.DataFrame(rows, columns=col_names)

    return files.groupBy("dir_key").applyInPandas(decode_dir, _OUT_SCHEMA)
