"""Short-circuit replica cache sweep pins (ShortCircuitCache.java
unref:440-508, demoteOldEvictableMmaped:510-549,
CacheCleaner.run:101-134, trimEvictionMaps:551-573)."""

from __future__ import annotations

from hadoop_source_spark.operators import scread

NOW = 10_000_000  # ms
NS = 1_000_000  # ns per ms


def _sweep(spark, replicas, conf):
    out = scread.cache_sweep(
        spark.createDataFrame(
            [(1, 1) + r for r in replicas],
            "cache_id long, conf_id long, rkey string, ref_count int,"
            " mmapped boolean, evictable_time_ns long",
        ),
        spark.createDataFrame(
            [(1,) + conf],
            "conf_id long, max_total int, max_mmaped int,"
            " nonmmap_life_ms long, mmap_life_ms long",
        ),
        now_ms=NOW,
    ).collect()
    return {r["rkey"]: r for r in out}


def _t(age_ms):
    return (NOW - age_ms) * NS


def test_referenced_replicas_not_in_eviction_maps(spark):
    got = _sweep(
        spark,
        [("a", 2, False, None), ("b", 3, True, None),
         ("c", 1, False, _t(10))],
        (10, 5, 1000, 1000),
    )
    assert got["a"]["action"] == "IN_USE"
    assert got["b"]["action"] == "IN_USE"
    assert got["a"]["demoted"] is None
    assert got["c"]["action"] == "RETAINED_REGULAR"


def test_demote_age_and_space(spark):
    # mmap lifespan 1000ms; max_mmaped 2 -> the loop breaks only
    # when the map size drops BELOW the cap (:530-532), so with 4
    # mmapped entries it demotes down to max_mmaped - 1 = 1 survivor
    got = _sweep(
        spark,
        [
            ("old", 1, True, _t(5_000)),    # too old -> age
            ("e1", 1, True, _t(900)),       # young, size 3 >= 2 -> space
            ("e2", 1, True, _t(800)),       # young, size 2 >= 2 -> space
            ("e3", 1, True, _t(700)),       # young, size 1 < 2 -> stays
        ],
        (10, 2, 100_000, 1_000),
    )
    assert (got["old"]["demoted"], got["old"]["demote_reason"]) == (
        True, "age")
    assert (got["e1"]["demoted"], got["e1"]["demote_reason"]) == (
        True, "space")
    assert (got["e2"]["demoted"], got["e2"]["demote_reason"]) == (
        True, "space")
    assert got["e3"]["demoted"] is False
    assert got["e3"]["action"] == "RETAINED_MMAP"
    # demoted entries keep their time; none is past the (large)
    # non-mmapped lifespan -> retained in the regular list
    assert got["old"]["action"] == "RETAINED_REGULAR"
    assert got["e1"]["action"] == "RETAINED_REGULAR"
    assert got["e2"]["action"] == "RETAINED_REGULAR"


def test_demoted_entry_keeps_time_and_can_lifespan_purge(spark):
    # non-mmap lifespan 1000ms: the demoted-for-age entry (4000ms
    # old) is immediately past it; a fresh regular entry survives
    got = _sweep(
        spark,
        [
            ("oldmm", 1, True, _t(4_000)),
            ("fresh", 1, False, _t(100)),
            ("oldreg", 1, False, _t(2_000)),
        ],
        (10, 5, 1_000, 3_000),
    )
    assert got["oldmm"]["demoted"] is True
    assert got["oldmm"]["action"] == "PURGED_LIFESPAN"
    assert got["oldreg"]["action"] == "PURGED_LIFESPAN"
    assert got["fresh"]["action"] == "RETAINED_REGULAR"


def test_trim_drains_regular_before_mmapped(spark):
    # 3 regular + 2 mmapped survivors, max_total 1 -> excess 4: all
    # three regulars drain first (oldest-first), then the oldest
    # mmapped — regardless of m1 being older than r3
    got = _sweep(
        spark,
        [
            ("r1", 1, False, _t(500)),
            ("r2", 1, False, _t(400)),
            ("r3", 1, False, _t(300)),
            ("m1", 1, True, _t(450)),
            ("m2", 1, True, _t(200)),
        ],
        (1, 5, 100_000, 100_000),
    )
    assert got["r1"]["action"] == "PURGED_TRIM"
    assert got["r2"]["action"] == "PURGED_TRIM"
    assert got["r3"]["action"] == "PURGED_TRIM"
    assert got["m1"]["action"] == "PURGED_TRIM"  # oldest mmapped
    assert got["m2"]["action"] == "RETAINED_MMAP"


def test_lifespan_purge_only_from_regular_list(spark):
    # an mmapped entry older than the non-mmap lifespan but inside
    # the mmap lifespan and size cap is NOT purged
    got = _sweep(
        spark,
        [("m", 1, True, _t(2_000)), ("r", 1, False, _t(2_000))],
        (10, 5, 1_000, 10_000),
    )
    assert got["m"]["action"] == "RETAINED_MMAP"
    assert got["r"]["action"] == "PURGED_LIFESPAN"


def test_max_mmaped_zero_demotes_everything(spark):
    got = _sweep(
        spark,
        [("m1", 1, True, _t(10)), ("m2", 1, True, _t(20))],
        (10, 0, 100_000, 100_000),
    )
    assert got["m1"]["demoted"] is True
    assert got["m2"]["demoted"] is True
    assert got["m1"]["action"] == "RETAINED_REGULAR"
