"""NFS write-reorder pins (OpenFileCtx.addWritesToCache:515-588,
offerNextToWrite:965-1017 drain order incl. the reversed comparator
:33-40 smallest-max-among-equal-min, covered-write removal :993-997,
drain-time trim :998-1006)."""

from __future__ import annotations

from hadoop_source_spark.operators import nfswrite

FILES_SCHEMA = "file_id long, initial_size long"
WRITES_SCHEMA = (
    "write_id long, file_id long, xid int, offset long, count int,"
    " data_matches boolean"
)


def _run(spark, writes, initial_size=0):
    out = nfswrite.write_reorder_plan(
        spark.createDataFrame([(0, initial_size)], FILES_SCHEMA),
        spark.createDataFrame(
            [(i, 0, i) + tuple(w) for i, w in enumerate(writes)],
            WRITES_SCHEMA.replace(
                "write_id long, file_id long, xid int,",
                "write_id long, file_id long, xid int,",
            ),
        ),
    ).collect()
    return {r["write_id"]: r for r in out}


def test_initial_size_and_same_min_drain_order(spark):
    # File reopened at size 100. Two buffered writes share offset
    # 200: the reversed comparator drains the SMALLER max first, so
    # (200,300) executes and (200,400) is then trimmed to [300,400).
    got = _run(spark, [
        (200, 200, True),   # buffered (200,400)
        (200, 100, True),   # buffered (200,300) — not same range
        (100, 100, True),   # sequential from initial size
    ], initial_size=100)
    assert got[0]["verdict"] == nfswrite.BUFFERED
    assert got[0]["trimmed_bytes"] == 100
    assert got[0]["executed"] is True
    assert got[1]["verdict"] == nfswrite.BUFFERED
    assert got[1]["trimmed_bytes"] == 0
    assert got[2]["verdict"] == nfswrite.SEQUENTIAL
    assert got[0]["final_offset"] == 400
    assert got[0]["max_buffered"] == 300


def test_repeated_after_drain_becomes_overwrite(spark):
    got = _run(spark, [
        (100, 100, True),   # buffered
        (0, 100, True),     # sequential -> drains the 100-200 write
        (100, 100, False),  # same range again, now BELOW nextOffset
    ])
    assert got[0]["verdict"] == nfswrite.BUFFERED
    assert got[0]["executed"] is True
    assert got[2]["verdict"] == nfswrite.PERFECT_OVERWRITE_MISMATCH
    assert got[2]["executed"] is False
    assert got[0]["final_offset"] == 200


def test_covered_write_dropped_without_writing(spark):
    got = _run(spark, [
        (300, 100, True),   # buffered (300,400)
        (250, 200, True),   # buffered (250,450)
        (0, 250, True),     # sequential to 250 -> drain both
    ])
    assert got[1]["executed"] is True      # (250,450) writes first
    assert got[0]["verdict"] == nfswrite.DROPPED_COVERED
    assert got[0]["executed"] is False
    assert got[0]["final_offset"] == 450
    assert got[0]["buffered_left"] == 0


def test_stuck_hole_reports_pending(spark):
    got = _run(spark, [
        (0, 100, True),
        (500, 100, True),
        (600, 100, True),
    ])
    assert got[0]["final_offset"] == 100
    assert got[0]["buffered_left"] == 2
    assert got[1]["executed"] is False
