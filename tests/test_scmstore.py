"""SharedCacheManager store/cleaner pins
(InMemorySCMStore.getInitialCachedResources:187-243,
isResourceEvictable:415-434, removeResource:380-397;
SCMStore.cleanResourceReferences:157-173;
CleanerTask.processSingleResource:196-276)."""

from __future__ import annotations

from hadoop_source_spark.operators import scmstore

NOW = 1_700_000_000_000
START = NOW - 150_000
STALE = NOW - 120_000  # staleness_minutes=2


def _clean(spark, resources, refs=(), apps=(), initial_apps=0):
    out = scmstore.cleaner_plan(
        spark.createDataFrame(
            resources,
            "key string, dir_name string, mod_time long,"
            " in_store boolean, access_time long, fs_fault string",
        ),
        spark.createDataFrame(
            list(refs) or [("_none", "_a")], "key string, app_id string"
        ).where("key <> '_none'"),
        spark.createDataFrame(
            [(a,) for a in apps] or [("_none",)], "app_id string"
        ).where("app_id <> '_none'"),
        staleness_minutes=2,
        start_time=START,
        now_ms=NOW,
        initial_apps=initial_apps,
    ).collect()
    return {r["key"]: r for r in out}


def test_bootstrap_first_file_per_key_wins(spark):
    files = spark.createDataFrame(
        [
            ("cs1", "b.jar", True),
            ("cs1", "a.jar", True),   # sorted order: a.jar wins
            ("cs1", "subdir", False),  # directories never mapped
            ("cs2", "only.jar", True),
        ],
        "parent_key string, file_name string, is_file boolean",
    )
    got = {r["key"]: r for r in scmstore.bootstrap_store(files).collect()}
    assert got["cs1"]["file_name"] == "a.jar"
    assert got["cs1"]["dup_files"] == 1
    assert got["cs2"]["dup_files"] == 0


def test_renamed_dir_deleted_outright(spark):
    got = _clean(spark, [
        ("k1", "d1-renamed", NOW, True, NOW, "none"),
        ("k2", "d2-renamed", NOW, True, NOW, "delete"),
        ("k3", "d3-renamed", NOW, True, NOW, "rename"),  # no rename step
    ])
    assert got["k1"]["action"] == "DELETED"
    assert got["k2"]["action"] == "INIT"
    assert got["k3"]["action"] == "DELETED"
    assert got["k1"]["evictable"] is None  # store never consulted
    assert got["k1"]["live_refs"] is None


def test_staleness_access_time_vs_mod_time_fallback(spark):
    got = _clean(spark, [
        # in store: access time decides
        ("fresh", "d", START, True, STALE + 5_000, "none"),
        ("stale", "d", NOW, True, STALE - 5_000, "none"),
        # not in store: max(mod, start) — old mod clamps to start,
        # and start (NOW-150k) < STALE (NOW-120k) -> evictable
        ("clamped", "d", START - 99_000_000, False, None, "none"),
        ("recentmod", "d", STALE + 5_000, False, None, "none"),
    ])
    assert got["fresh"]["action"] == "PROCESSED"
    assert not got["fresh"]["evictable"]
    assert got["stale"]["action"] == "DELETED"
    assert got["clamped"]["action"] == "DELETED"
    assert got["clamped"]["last_use"] == START
    assert got["recentmod"]["action"] == "PROCESSED"


def test_live_refs_block_removal_dead_refs_removed(spark):
    refs = [("k", "app1"), ("k", "app2"), ("k", "app3"),
            ("k2", "app9")]
    got = _clean(
        spark,
        [("k", "d", NOW, True, STALE - 1, "none"),
         ("k2", "d", NOW, True, STALE - 1, "none")],
        refs=refs,
        apps=["app2"],
    )
    # k: one live ref survives cleanResourceReferences -> PROCESSED
    r = got["k"]
    assert (r["action"], r["live_refs"], r["dead_removed"]) == (
        "PROCESSED", 1, 2)
    assert r["evictable"]  # evictable but kept by references
    # k2: only a dead ref -> removed -> DELETED
    assert got["k2"]["action"] == "DELETED"
    assert got["k2"]["dead_removed"] == 1


def test_initial_apps_grace_blocks_eviction(spark):
    got = _clean(
        spark,
        [("k", "d", NOW, True, STALE - 99_999, "none"),
         ("kr", "d-renamed", NOW, True, NOW, "none")],
        initial_apps=3,
    )
    assert got["k"]["action"] == "PROCESSED"
    assert got["k"]["evictable"] is False
    # renamed cleanup ignores the grace entirely
    assert got["kr"]["action"] == "DELETED"


def test_fs_faults_produce_error(spark):
    got = _clean(spark, [
        ("k1", "d", NOW, True, STALE - 1, "rename"),
        ("k2", "d", NOW, True, STALE - 1, "delete"),
        ("k3", "d", START - 10, False, None, "rename"),  # not in store: trivially removed
    ])
    assert got["k1"]["action"] == "ERROR"
    assert got["k2"]["action"] == "ERROR"
    assert got["k3"]["action"] == "ERROR"
