"""KV-table operators modeled on the reference's file containers.

SequenceFile (common/io/SequenceFile.java) → a (key, value) DataFrame.
MapFile (common/io/MapFile.java)           → the same, sorted by key; its
sparse index + binary search become Parquet row-group stats + pushdown.
SetFile (common/io/SetFile.java)           → distinct keys.
ArrayFile (common/io/ArrayFile.java)       → position-keyed records.
BloomMapFile (common/io/BloomMapFile.java) → membership pre-filter before
lookup; in Spark the analog is a left-semi join (exact) or the runtime
bloom-filter join Catalyst injects on its own (approximate, no false
negatives — same contract as BloomFilter.membershipTest).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_source_spark.operators.asof import asof_join


def kv_sort(df: DataFrame, key: str = "key") -> DataFrame:
    """MapFile invariant: data sorted by key (ties stable by remaining cols).

    repartitionByRange + sortWithinPartitions = global sort without a
    single-reducer bottleneck; written out it yields key-clustered files
    whose min/max stats serve as the MapFile index.
    """
    return df.repartitionByRange(F.col(key)).sortWithinPartitions(key)


def kv_lookup(kv: DataFrame, probes: DataFrame, key: str = "key") -> DataFrame:
    """MapFile.Reader.get (MapFile.java:681): point lookups for a probe set.

    Expressed as an equi-join so Catalyst picks broadcast (small probe set)
    or shuffle-hash; for a literal handful of keys prefer
    kv.filter(col(key).isin(...)) which pushes down to the scan.
    """
    return probes.join(kv, on=key, how="left")


def kv_get_closest(
    kv: DataFrame,
    probes: DataFrame,
    key: str = "key",
    before: bool = False,
) -> DataFrame:
    """MapFile.Reader.getClosest (MapFile.java:699,715).

    before=False → first entry with kv.key >= probe key (null if probe is
    past the last key); before=True → last entry <= probe key (null if
    before the first). Exact matches win in both directions.
    """
    return asof_join(
        probes,
        kv,
        on=key,
        by=None,
        direction="backward" if before else "forward",
        how="left",
    )


def kv_distinct_keys(kv: DataFrame, key: str = "key") -> DataFrame:
    """SetFile: the persisted distinct-key set."""
    return kv.select(key).distinct()


def kv_membership(
    kv: DataFrame, probes: DataFrame, key: str = "key"
) -> DataFrame:
    """SetFile/BloomMapFile membership: probes that exist in kv (exact,
    left-semi). Catalyst's runtime bloom filter provides the approximate
    pre-filter tier automatically when beneficial."""
    return probes.join(kv, on=key, how="left_semi")


def with_position(df: DataFrame, order: Sequence[str], pos_col: str = "pos") -> DataFrame:
    """ArrayFile: stable 0-based position keyed by a deterministic order
    (io/ArrayFile.java:38). Delegates to the distributed range-partition +
    per-partition-offset kernel — no single-partition window, scales."""
    from hadoop_source_spark.operators.relational import with_global_positions

    return with_global_positions(df, order, pos_col)
