"""User→groups resolution cache: the lookup path every Hadoop
authorization check goes through (``hadoop.security.groups.*``).

Reference semantics (`hadoop-common/.../security/Groups.java`):

- ``getGroups:209-232`` order: the static override map short-circuits
  everything (``hadoop.user.group.static.mapping.overrides``,
  ``parseStaticMapping:164-192`` — a user mapped WITHOUT groups gets
  the EMPTY list, not an error); then the negative cache (only when
  ``negativeCacheTimeout > 0``) throws "No groups found"; then the
  Guava cache built with ``refreshAfterWrite(cacheTimeout)`` and
  ``expireAfterWrite(10 * cacheTimeout)`` (:135-140).
- ``GroupCacheLoader.load:310-340``: a fetch returning no groups
  adds the user to the negative cache (when enabled) and throws so
  the empty result is never retained; fetched lists are de-duped
  preserving first occurrence (LinkedHashSet).
- ``reload:346-380``: past ``cacheTimeout`` but before the 10x
  expiry the entry is refreshed — in background mode the caller gets
  the OLD value immediately and the refresh runs async; in blocking
  mode the caller gets the NEW value, EXCEPT that a reload failure
  (the empty-fetch throw) leaves Guava serving the old value for
  this call too — the user only starts failing once the negative
  cache entry lands. Past the 10x expiry the entry is gone and the
  lookup is an ordinary blocking load.

Spark-first: one codegen when-chain per lookup row (the fetch
outcome is an input column standing in for the live
GroupMappingServiceProvider call); dedup is array_distinct over the
split list — no joins, no shuffles, map-side at any fleet size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATIC = "STATIC"
NEGATIVE_CACHE = "NEGATIVE_CACHE"
CACHE_FRESH = "CACHE_FRESH"
LOADED = "LOADED"
NO_GROUPS = "NO_GROUPS"
RELOADED = "RELOADED"
STALE_SERVED = "STALE_SERVED"


def group_lookup_plan(
    lookups: DataFrame,
    *,
    cache_timeout_ms: int,
    negative_cache_enabled: bool,
) -> DataFrame:
    """Resolve a batch of group lookups against a cache snapshot.

    ``lookups``: (lookup_id, user, static_csv string nullable — the
    static override (empty string = mapped with no groups),
    negative_hit boolean, cache_age_ms long nullable — null when the
    user has no cache entry, cached_csv string — the entry's current
    value, fetch_csv string nullable — what a fresh provider fetch
    returns, null = no groups, duplicates allowed,
    reload_in_background boolean).

    Returns (lookup_id, outcome, groups string nullable — csv,
    refresh_mode 'background'|'blocking' nullable, negative_added
    boolean)."""
    expire_ms = 10 * cache_timeout_ms
    age = F.col("cache_age_ms")
    fetch_empty = F.col("fetch_csv").isNull()
    fetched = F.array_join(
        F.array_distinct(F.split(F.col("fetch_csv"), ",")), ","
    )
    miss = age.isNull() | (age >= expire_ms)
    refresh_window = ~miss & (age >= cache_timeout_ms)
    neg = F.lit(negative_cache_enabled)

    outcome = (
        F.when(F.col("static_csv").isNotNull(), STATIC)
        .when(neg & F.col("negative_hit"), NEGATIVE_CACHE)
        .when(miss & fetch_empty, NO_GROUPS)
        .when(miss, LOADED)
        .when(~refresh_window, CACHE_FRESH)
        .when(F.col("reload_in_background"), STALE_SERVED)
        .when(fetch_empty, STALE_SERVED)
        .otherwise(RELOADED)
    )
    groups = (
        F.when(outcome == STATIC, F.col("static_csv"))
        .when(outcome.isin(LOADED, RELOADED), fetched)
        .when(
            outcome.isin(CACHE_FRESH, STALE_SERVED), F.col("cached_csv")
        )
    )
    refresh_mode = F.when(
        refresh_window
        & ~outcome.isin(STATIC, NEGATIVE_CACHE),
        F.when(F.col("reload_in_background"), "background").otherwise(
            "blocking"
        ),
    )
    # the load() empty-fetch throw adds to the negative cache on the
    # miss path AND on either refresh path (:328-334)
    negative_added = neg & fetch_empty & (
        (outcome == NO_GROUPS)
        | (refresh_window & ~outcome.isin(STATIC, NEGATIVE_CACHE))
    )
    return lookups.select(
        "lookup_id",
        outcome.alias("outcome"),
        groups.alias("groups"),
        refresh_mode.alias("refresh_mode"),
        negative_added.alias("negative_added"),
    )
