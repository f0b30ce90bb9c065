"""Groups cache pins (Groups.java getGroups:209-232,
parseStaticMapping:164-192, GroupCacheLoader.load:310-340,
reload:346-380; Guava refreshAfterWrite=cacheTimeout,
expireAfterWrite=10x :135-140)."""

from __future__ import annotations

from hadoop_source_spark.operators import groupscache

SCHEMA = (
    "lookup_id long, user string, static_csv string,"
    " negative_hit boolean, cache_age_ms long, cached_csv string,"
    " fetch_csv string, reload_in_background boolean"
)


def _run(spark, rows, enabled=True, timeout=100):
    out = groupscache.group_lookup_plan(
        spark.createDataFrame(rows, SCHEMA),
        cache_timeout_ms=timeout,
        negative_cache_enabled=enabled,
    ).collect()
    return {r["lookup_id"]: r for r in out}


def test_static_overrides_everything(spark):
    got = _run(spark, [
        # static beats even a negative-cache hit
        (1, "u", "a,b", True, None, "c", "d", False),
        # a user mapped WITHOUT groups gets the empty list, no error
        (2, "u", "", False, None, "c", "d", False),
    ])
    assert (got[1]["outcome"], got[1]["groups"]) == ("STATIC", "a,b")
    assert (got[2]["outcome"], got[2]["groups"]) == ("STATIC", "")


def test_negative_cache_gated_on_timeout(spark):
    rows = [(1, "u", None, True, None, "c", "a", False)]
    assert _run(spark, rows)[1]["outcome"] == "NEGATIVE_CACHE"
    assert _run(spark, rows)[1]["groups"] is None
    # negativeCacheTimeout <= 0 disables the check entirely
    assert _run(spark, rows, enabled=False)[1]["outcome"] == "LOADED"


def test_miss_load_dedups_and_empty_fetch_throws(spark):
    got = _run(spark, [
        (1, "u", None, False, None, None, "a,b,a", False),
        (2, "u", None, False, None, None, None, False),
        # past the 10x expiry the entry is gone: ordinary load
        (3, "u", None, False, 1000, "old", "x", False),
    ])
    assert (got[1]["outcome"], got[1]["groups"]) == ("LOADED", "a,b")
    assert got[1]["negative_added"] is False
    assert (got[2]["outcome"], got[2]["groups"]) == ("NO_GROUPS", None)
    assert got[2]["negative_added"] is True
    assert (got[3]["outcome"], got[3]["groups"]) == ("LOADED", "x")


def test_fresh_and_refresh_window(spark):
    got = _run(spark, [
        (1, "u", None, False, 99, "old", "new", False),   # fresh
        (2, "u", None, False, 100, "old", "new", False),  # blocking reload
        (3, "u", None, False, 100, "old", "new", True),   # bg: old served
        # blocking reload whose fetch is empty: Guava keeps the old
        # value for THIS call, the negative-cache entry fails the next
        (4, "u", None, False, 500, "old", None, False),
        (5, "u", None, False, 500, "old", None, True),
    ])
    assert (got[1]["outcome"], got[1]["groups"], got[1]["refresh_mode"]) \
        == ("CACHE_FRESH", "old", None)
    assert (got[2]["outcome"], got[2]["groups"], got[2]["refresh_mode"]) \
        == ("RELOADED", "new", "blocking")
    assert (got[3]["outcome"], got[3]["groups"], got[3]["refresh_mode"]) \
        == ("STALE_SERVED", "old", "background")
    assert (got[4]["outcome"], got[4]["groups"]) == ("STALE_SERVED", "old")
    assert got[4]["negative_added"] is True
    assert got[5]["negative_added"] is True
    assert got[3]["negative_added"] is False
