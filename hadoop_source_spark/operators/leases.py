"""Write-lease tracking + the lease-recovery sweep.

Reference semantics (`hdfs/server/namenode/LeaseManager.java`):
- a lease belongs to a HOLDER (client), covers every file that client
  has open for write, and carries one lastUpdate renewed by client
  heartbeats (`Lease.renew`, :350);
- past the SOFT limit (60 s default) any other client may preempt the
  lease and force recovery on a file (`FSNamesystem.recoverLeaseInternal`);
- past the HARD limit (1 h default) the NameNode itself recovers ALL
  files under the lease — `checkLeases` (:584) walks leases oldest-first
  and calls internalReleaseLease per path.

Spark-first: lease state is holder-granular, so the sweep is one
groupBy(holder) over the open-file table (bounded by the client
population) broadcast back onto the files. Limits are parameters —
the driver fixture feeds day-scale ages, the reference defaults are
60 s / 3600 s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lease_sweep(
    open_files: DataFrame,
    probe: DataFrame,
    soft_s: float = 60.0,
    hard_s: float = 3600.0,
) -> DataFrame:
    """Classify every open file by its HOLDER's lease age.

    open_files: path, holder, last_activity_ts (per-file write
    activity; the holder's lease lastUpdate is the max over its
    files — one renew covers the whole lease, as Lease.renew does).
    probe: ONE-ROW frame with now_s (bigint epoch seconds).

    Output per file: path, holder, lease_age_s, lease_state
    (ACTIVE / SOFT_EXPIRED / HARD_EXPIRED), recover_by
    (NAMENODE past hard, PREEMPTABLE past soft, null while active),
    holder_open_files."""
    lease = open_files.groupBy("holder").agg(
        F.max(F.unix_timestamp("last_activity_ts")).alias("__last_update"),
        F.count(F.lit(1)).alias("holder_open_files"),
    )
    joined = (
        open_files.join(F.broadcast(lease), "holder")
        .crossJoin(F.broadcast(probe))
        .withColumn(
            "lease_age_s",
            (F.col("now_s") - F.col("__last_update")).cast("double"),
        )
    )
    state = (
        F.when(F.col("lease_age_s") > hard_s, F.lit("HARD_EXPIRED"))
        .when(F.col("lease_age_s") > soft_s, F.lit("SOFT_EXPIRED"))
        .otherwise(F.lit("ACTIVE"))
    )
    return joined.select(
        "path",
        "holder",
        F.col("lease_age_s").cast("long").alias("lease_age_s"),
        state.alias("lease_state"),
        F.when(state == "HARD_EXPIRED", F.lit("NAMENODE"))
        .when(state == "SOFT_EXPIRED", F.lit("PREEMPTABLE"))
        .alias("recover_by"),
        "holder_open_files",
    )
