"""Snapshot-creation admission: replay a stream of createSnapshot
requests against the per-directory and namespace-wide limits.

Reference semantics:
- `namenode/snapshot/SnapshotManager.java:316-345 (createSnapshot)`
  — checks run in order: the directory must be snapshottable
  (getSnapshottableRoot throws otherwise), then the namespace-wide
  snapshot-ID space (`snapshotCounter == getMaxSnapshotID()` fails
  ALL subsequent creations — "ID rollover is not supported"), then
  the per-directory checks inside addSnapshot.
- `namenode/snapshot/DirectorySnapshottableFeature.java:181-205
  (addSnapshot)` — per directory, in order: the per-directory
  snapshot QUOTA (n+1 > snapshotQuota), then the system-wide
  per-directory LIMIT (n+1 > maxSnapshotLimit), then the duplicate
  NAME check. Only an admitted snapshot increments n and consumes a
  snapshot ID.

Closed-form replay: within a directory, rejected requests never grow
n, so the admitted set is exactly the first (cap - existing) requests
carrying a fresh name, cap = min(quota, maxSnapshotLimit); n at any
request's turn is existing + min(#prior fresh-name requests,
max(0, cap - existing)). A name is fresh unless it already exists in
the directory or appeared earlier in the stream (an earlier
occurrence either was admitted — NAME applies — or was itself
rejected for a reason that still holds at the later request). The
ID-space check is modeled per namespace at steady state (exhausted
namespaces fail everything; mid-stream exhaustion is inherently
sequential, documented out of scope). Two window passes sharing the
(ns, dir_path) key + two broadcast joins — partition-parallel
across directories at any request rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def admit(
    requests: DataFrame, dirs: DataFrame, namespaces: DataFrame
) -> DataFrame:
    """Classify every request: OK / NOT_SNAPSHOTTABLE / OUT_OF_IDS /
    QUOTA_EXCEEDED / LIMIT_EXCEEDED / NAME_EXISTS (the reference's
    check order).

    `requests`: (req_id long, ns, dir_path, name, t long — arrival
    order); `dirs`: (ns, dir_path, snapshottable bool, existing_n
    int, quota int, max_limit int, existing_names array<string>);
    `namespaces`: (ns, ids_exhausted bool)."""
    j = (
        requests.join(F.broadcast(dirs), ["ns", "dir_path"], "left")
        .join(F.broadcast(namespaces), "ns", "left")
        .withColumn(
            "ids_exhausted", F.coalesce("ids_exhausted", F.lit(False))
        )
    )
    dup_existing = F.coalesce(
        F.array_contains(F.col("existing_names"), F.col("name")),
        F.lit(False),
    )
    seen_earlier = (
        F.row_number().over(
            Window.partitionBy("ns", "dir_path", "name").orderBy(
                F.col("t").asc(), F.col("req_id").asc()
            )
        )
        > 1
    )
    # two stages: the fresh flag is itself a window result, so the
    # running count must come from a second pass
    staged = j.withColumn("__fresh", ~dup_existing & ~seen_earlier)
    stream = Window.partitionBy("ns", "dir_path").orderBy(
        F.col("t").asc(), F.col("req_id").asc()
    )
    prior_fresh = F.coalesce(
        F.sum(F.col("__fresh").cast("long")).over(
            stream.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    quota = F.col("quota").cast("long")
    limit = F.col("max_limit").cast("long")
    cap = F.least(quota, limit)
    # In NOT_SNAPSHOTTABLE dirs and OUT_OF_IDS namespaces the reference
    # never reaches addSnapshot, so no prior request can have grown n —
    # the count stays at existing_n regardless of the request stream.
    # (Both flags are constant within a (ns, dir_path) partition, so
    # the gate composes with the window without a second pass.)
    admissible = (
        F.coalesce(F.col("snapshottable"), F.lit(False))
        & ~F.col("ids_exhausted")
    )
    n_now = F.col("existing_n") + F.when(
        admissible,
        F.least(
            prior_fresh, F.greatest(cap - F.col("existing_n"), F.lit(0))
        ),
    ).otherwise(F.lit(0))
    verdict = (
        F.when(
            F.col("snapshottable").isNull() | ~F.col("snapshottable"),
            F.lit("NOT_SNAPSHOTTABLE"),
        )
        .when(F.col("ids_exhausted"), F.lit("OUT_OF_IDS"))
        .when(n_now + 1 > quota, F.lit("QUOTA_EXCEEDED"))
        .when(n_now + 1 > limit, F.lit("LIMIT_EXCEEDED"))
        .when(~F.col("__fresh"), F.lit("NAME_EXISTS"))
        .otherwise(F.lit("OK"))
    )
    return staged.select(
        "req_id",
        "ns",
        "dir_path",
        "name",
        verdict.alias("verdict"),
        F.when(F.col("existing_n").isNotNull(), n_now)
        .cast("long")
        .alias("snapshots_at_request"),
    )
