"""NM FPGA device allocation: per-type pools, IP-program-aware device
choice, and recovery validation of persisted assignments.

Reference semantics (`hadoop-yarn-server-nodemanager/.../containermanager/
linux/resources/fpga/FpgaResourceAllocator.java` behind
`IntelFpgaOpenclPlugin.java:45`'s discovery; pinned by
`TestFpgaResourceHandlerImpl.java`):

- Devices pool PER TYPE (``availableFpgas`` keyed by the vendor
  plugin's type, ``addFpgaDevices:150-165``). A request for an absent
  type fails ("No such type of FPGA resource available",
  ``assignFpga:190-192``); count < 0 or count > available(type) fails
  ("Invalid FPGA request count or not enough", :193-196).
- A zero-count request allocates nothing and denies ALL allowed
  devices (:236-237 returns ``FpgaAllocation(null, allowedFpgas)``).
- Otherwise the allocator FIRST takes every available device of the
  type whose programmed aocx hash equals the request's localized-aocx
  hash case-insensitively — ALL of them, even past the requested
  count (:199-210, avoiding IP reprogramming) — then fills any
  remaining count from the head of the available list (:211-215).
  The engine pins "list order" to (index, minor), the discovery
  order. The denied set is what remains available of the node's
  devices (:233).
- The executed container reprograms its devices' IPID/hash
  (``updateFpga:167-174``) — modeled by `reprogram`.
- Recovery (``recoverAssignedFpgas:237-268``): each persisted device
  must be a known allowed device and not currently held by another
  container; either violation is a ResourceHandlerException.

Spark-first: per-(request, device) match ranking is one row_number
window keyed by the request — a single shuffle on (node, container);
per-node/type pool stats ride a broadcastable aggregate; zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ASSIGNED = "ASSIGNED"
ALLOW_NONE = "ALLOW_NONE"
FAIL_NO_TYPE = "FAIL_NO_TYPE"
FAIL_COUNT = "FAIL_COUNT"

RECOVER_OK = "OK"
RECOVER_NOT_ALLOWED = "NOT_ALLOWED"
RECOVER_ALREADY_ASSIGNED = "ALREADY_ASSIGNED"


def assign_fpgas(requests: DataFrame, devices: DataFrame) -> DataFrame:
    """Snapshot allocation verdicts.

    ``requests``: (node_id, container_id, fpga_type, requested long,
    ipid_hash string nullable). ``devices``: (node_id, fpga_type,
    minor int, aocx_hash string nullable — the currently-programmed
    IP, used_by string nullable).

    Returns one row per assigned device plus one device-less row per
    non-assigning verdict: (node_id, container_id, verdict, minor,
    ip_matched boolean, n_assigned, n_denied)."""
    pool = devices.groupBy("node_id", "fpga_type").agg(
        F.count(F.lit(1)).alias("n_type"),
        F.sum(F.when(F.col("used_by").isNull(), 1).otherwise(0)).alias(
            "n_avail"
        ),
    )
    node_allowed = devices.groupBy("node_id").agg(
        F.count(F.lit(1)).alias("n_allowed")
    )
    r = (
        requests.join(pool, ["node_id", "fpga_type"], "left")
        .join(node_allowed, "node_id", "left")
    )
    # Per-request IP-match count decides how many devices it takes:
    # max(requested, n_match) — every matching device is grabbed.
    free = devices.where(F.col("used_by").isNull()).select(
        "node_id", "fpga_type", "minor", "aocx_hash"
    )
    paired = r.join(free, ["node_id", "fpga_type"], "left").withColumn(
        "__match",
        F.col("aocx_hash").isNotNull()
        & F.col("ipid_hash").isNotNull()
        & (F.lower("aocx_hash") == F.lower("ipid_hash")),
    )
    w_req = Window.partitionBy("node_id", "container_id")
    rank = F.row_number().over(
        w_req.orderBy(F.col("__match").desc(), F.col("minor").asc())
    )
    n_match = F.sum(F.when(F.col("__match"), 1).otherwise(0)).over(w_req)
    scored = paired.select(
        "node_id", "container_id", "requested", "ipid_hash",
        "n_type", "n_avail", "n_allowed", "minor", "__match",
        rank.alias("__rk"),
        n_match.alias("__n_match"),
    )
    verdict = (
        F.when(F.col("n_type").isNull(), FAIL_NO_TYPE)
        .when(
            (F.col("requested") < 0)
            | (F.col("requested") > F.col("n_avail")),
            FAIL_COUNT,
        )
        .when(F.col("requested") == 0, ALLOW_NONE)
        .otherwise(ASSIGNED)
    )
    take = F.greatest(F.col("requested"), F.col("__n_match"))
    assigned = (
        scored.withColumn("__v", verdict)
        .where((F.col("__v") == ASSIGNED) & (F.col("__rk") <= take))
        .select(
            "node_id",
            "container_id",
            F.col("__v").alias("verdict"),
            "minor",
            F.col("__match").alias("ip_matched"),
            take.cast("long").alias("n_assigned"),
            (F.col("n_avail") - take).cast("long").alias("n_denied"),
        )
    )
    others = (
        r.withColumn("__v", verdict)
        .where(F.col("__v") != ASSIGNED)
        .select(
            "node_id",
            "container_id",
            F.col("__v").alias("verdict"),
            F.lit(None).cast("int").alias("minor"),
            F.lit(None).cast("boolean").alias("ip_matched"),
            F.lit(0).cast("long").alias("n_assigned"),
            # ALLOW_NONE denies every allowed device on the node
            # (assignFpga:236-237); failures deny nothing (they throw).
            F.when(F.col("__v") == ALLOW_NONE, F.col("n_allowed"))
            .otherwise(0).cast("long").alias("n_denied"),
        )
    )
    return assigned.unionByName(others)


def reprogram(devices: DataFrame, programmed: DataFrame) -> DataFrame:
    """updateFpga:167-174 — after a container programs its aocx, the
    device table's IPID/hash update. ``programmed``: (node_id, minor,
    new_ipid, new_hash). Broadcast merge, last state wins."""
    p = F.broadcast(
        programmed.select(
            "node_id", "minor",
            F.col("new_ipid").alias("__ipid"),
            F.col("new_hash").alias("__hash"),
        )
    )
    return (
        devices.join(p, ["node_id", "minor"], "left")
        .withColumn("ipid", F.coalesce("__ipid", "ipid"))
        .withColumn("aocx_hash", F.coalesce("__hash", "aocx_hash"))
        .drop("__ipid", "__hash")
    )


def recover_fpgas(mappings: DataFrame, devices: DataFrame) -> DataFrame:
    """recoverAssignedFpgas:237-268 validation per persisted mapping.

    ``mappings``: (node_id, container_id, fpga_type, minor int).
    Returns each mapping with verdict OK | NOT_ALLOWED |
    ALREADY_ASSIGNED (held by a DIFFERENT container)."""
    dev = devices.select(
        "node_id", "fpga_type", "minor",
        F.col("used_by").alias("_holder"),
        F.lit(True).alias("_known"),
    )
    j = mappings.join(dev, ["node_id", "fpga_type", "minor"], "left")
    return j.select(
        "node_id", "container_id", "fpga_type", "minor",
        F.when(F.col("_known").isNull(), RECOVER_NOT_ALLOWED)
        .when(
            F.col("_holder").isNotNull()
            & (F.col("_holder") != F.col("container_id")),
            RECOVER_ALREADY_ASSIGNED,
        )
        .otherwise(RECOVER_OK)
        .alias("verdict"),
    )
