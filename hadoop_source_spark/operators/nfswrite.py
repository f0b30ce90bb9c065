"""NFS gateway write reordering: how out-of-order NFS3 WRITEs become
a sequential HDFS stream.

Reference semantics (`hadoop-hdfs-nfs/.../nfs3/OpenFileCtx.java`):

- Arrival (``addWritesToCache:515-588``): a write whose whole range
  sits at or below nextOffset is handled as an overwrite; the
  reference replies NFS3_OK only when a read-back shows byte-equal
  content, else NFS3ERR_INVAL (``processPerfectOverWrite``) — the
  engine takes the comparison outcome as an input flag. A range
  straddling nextOffset drops the already-written prefix and appends
  only the new tail (``alterWriteRequest``, the reopen-combines-
  buffers Linux client case :535-553). ``offset == nextOffset`` is
  sequential (NO_DUMP); ``offset > nextOffset`` buffers
  (ALLOW_DUMP), counting toward the non-sequential memory gauge,
  unless the EXACT range is already pending — a repeated request is
  dropped (``checkRepeatedWriteRequest:409-440``). The "jumbo
  random write" NFS3ERR_INVAL (:596-599) needs the overwrite check
  and the write-back thread to race; under the engine's
  deterministic synchronous schedule it is unreachable and is
  documented as such.
- Drain (``offerNextToWrite:965-1017``): pendingWrites is ordered by
  a REVERSED comparator (:33-40), so ``lastEntry`` pops the
  smallest offset (smallest max among equals). A pending write
  beyond nextOffset is a hole — stop; one wholly at or below it is
  silently removed WITHOUT writing (:993-997 — later sequential
  writes covered it); one straddling it is trimmed at execution
  (:998-1006); otherwise it writes and advances nextOffset.
- The real gateway drains on a separate thread, so ALLOW_DUMP vs
  sequential classification is timing-dependent; the engine runs the
  deterministic schedule "drain fully after every arrival", which
  the reference converges to under a quiesced writer.

Spark-first: writes group per file (one shuffle) and the
per-file fold — a pending-map replay in arrival order — runs as an
Arrow-batched kernel, partition-parallel by file; the per-file write
count is protocol-bounded (an NFS client's in-flight window), so the
fold is O(window) per file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEQUENTIAL = "SEQUENTIAL"
BUFFERED = "BUFFERED"
TRIMMED_APPEND = "TRIMMED_APPEND"
PERFECT_OVERWRITE_OK = "PERFECT_OVERWRITE_OK"
PERFECT_OVERWRITE_MISMATCH = "PERFECT_OVERWRITE_MISMATCH"
REPEATED_DROP = "REPEATED_DROP"
DROPPED_COVERED = "DROPPED_COVERED"

_SCHEMA = (
    "write_id long, file_id long, verdict string, trimmed_bytes int,"
    " executed boolean, final_offset long, max_buffered long,"
    " buffered_left int"
)


def write_reorder_plan(files: DataFrame, writes: DataFrame) -> DataFrame:
    """Replay each file's NFS WRITE stream.

    ``files``: (file_id, initial_size long). ``writes``: (write_id,
    file_id, xid int — arrival order, offset long, count int,
    data_matches boolean — the perfect-overwrite read-back outcome).

    Returns one row per write: verdict, bytes trimmed (at arrival or
    at drain), whether it reached the HDFS stream, plus the file's
    final nextOffset, high-water of buffered out-of-order bytes, and
    the count of writes still stuck behind holes."""
    grouped = (
        writes.groupBy("file_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "xid", "write_id", "offset", "count",
                        "data_matches",
                    )
                )
            ).alias("ws")
        )
        .join(files, "file_id")
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            out: list[tuple] = []
            for row in pdf.itertuples(index=False):
                nxt = row.initial_size
                # pending: (offset, end) -> [write_id, count, trimmed]
                pending: dict[tuple[int, int], list] = {}
                res: dict[int, list] = {}  # write_id -> [verdict, trim, exec]
                buffered_bytes = 0
                max_buffered = 0

                def drain():
                    nonlocal nxt, buffered_bytes
                    while pending:
                        key = min(pending)  # smallest offset, then max
                        off, end = key
                        if off > nxt:
                            return  # hole
                        ent = pending.pop(key)
                        buffered_bytes -= ent[1]
                        if end <= nxt:
                            res[ent[0]] = [DROPPED_COVERED, ent[2], False]
                            continue
                        if off < nxt:
                            ent[2] += nxt - off
                        res[ent[0]][2] = True
                        res[ent[0]][1] = ent[2]
                        nxt = end

                for w in row.ws:
                    off, cnt = w["offset"], w["count"]
                    end = off + cnt
                    wid = w["write_id"]
                    if end <= nxt:
                        v = (
                            PERFECT_OVERWRITE_OK
                            if w["data_matches"]
                            else PERFECT_OVERWRITE_MISMATCH
                        )
                        res[wid] = [v, 0, False]
                        continue
                    trim = 0
                    if off < nxt:
                        trim = int(nxt - off)
                        off = nxt
                        cnt = end - off
                        res[wid] = [TRIMMED_APPEND, trim, True]
                    elif off == nxt:
                        res[wid] = [SEQUENTIAL, 0, True]
                    else:
                        if (off, end) in pending:
                            res[wid] = [REPEATED_DROP, 0, False]
                            continue
                        res[wid] = [BUFFERED, 0, False]
                        pending[(off, end)] = [wid, cnt, 0]
                        buffered_bytes += cnt
                        max_buffered = max(max_buffered, buffered_bytes)
                        continue
                    nxt = end
                    drain()
                left = len(pending)
                for w in row.ws:
                    wid = w["write_id"]
                    v, trim, ex = res[wid]
                    out.append(
                        (wid, row.file_id, v, trim, ex, nxt,
                         max_buffered, left)
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "write_id", "file_id", "verdict", "trimmed_bytes",
                    "executed", "final_offset", "max_buffered",
                    "buffered_left",
                ],
            )

    return grouped.mapInPandas(kernel, _SCHEMA)
