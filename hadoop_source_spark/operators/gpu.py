"""NM GPU device allocation: which exact GPU devices a container gets,
when it must wait for releasing devices, when the request fails, and
the recovery-time validation of persisted device assignments.

Reference semantics (`hadoop-yarn-server-nodemanager/.../containermanager/
linux/resources/gpu/GpuResourceAllocator.java`):

- Devices are kept in a TreeSet ordered by (index, minor); a request
  for R GPUs takes the FIRST R free devices in that order
  (``internalAssignGpus:248-258``); the denied set — what the device
  cgroup blocks — is every allowed device not assigned (:271-272). A
  zero-GPU request allocates nothing and denies ALL devices (:274).
- When R exceeds the free count but fits within free + releasing
  (devices held by containers already in a final state,
  ``getReleasingGpus:279-295`` — the reference sums the holders' GPU
  resource values, which equals their held device count since
  assignment grants exactly the requested number), the allocator
  WAITS, retrying once per second up to the configured period before
  failing with "might not releasing" (``assignGpus:182-218``). When R
  exceeds even free + releasing it fails immediately with "Failed to
  find enough GPUs" (:241-246).
- Recovery (``recoverAssignedGpus:118-160``): each persisted device
  must be in the allowed list and not already assigned; either
  violation is a ResourceHandlerException.

The reference serializes assignment per node behind a lock; the
engine reports the snapshot decision matrix — each request evaluated
against the node's current device table, the same way the other
scheduler operators report per-tick verdicts.

Spark-first: free-device ranking is one row_number window per node;
requests join node aggregates broadcast-style; zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ASSIGNED = "ASSIGNED"
ALLOW_NONE = "ALLOW_NONE"
WAIT_RELEASING = "WAIT_RELEASING"
FAIL_NOT_ENOUGH = "FAIL_NOT_ENOUGH"

RECOVER_OK = "OK"
RECOVER_NOT_ALLOWED = "NOT_ALLOWED"
RECOVER_ALREADY_ASSIGNED = "ALREADY_ASSIGNED"


def assign_gpus(requests: DataFrame, devices: DataFrame) -> DataFrame:
    """Snapshot allocation verdicts.

    ``requests``: (node_id, container_id, requested long).
    ``devices``: (node_id, gpu_index int, minor int, used_by string
    nullable — the holding container, holder_final boolean — that
    holder is in a final state and its device is about to release).

    Returns one row per assigned device and one device-less row per
    non-assigning verdict: (node_id, container_id, verdict ASSIGNED |
    ALLOW_NONE | WAIT_RELEASING | FAIL_NOT_ENOUGH, gpu_index, minor,
    n_assigned, n_denied — allowed minus assigned, the device-cgroup
    deny count)."""
    per_node = devices.groupBy("node_id").agg(
        F.count(F.lit(1)).alias("n_allowed"),
        F.sum(F.when(F.col("used_by").isNull(), 1).otherwise(0)).alias(
            "n_avail"
        ),
        F.sum(
            F.when(
                F.col("used_by").isNotNull() & F.col("holder_final"), 1
            ).otherwise(0)
        ).alias("n_releasing"),
    )
    r = requests.join(per_node, "node_id")
    verdict = (
        F.when(F.col("requested") <= 0, ALLOW_NONE)
        .when(F.col("requested") <= F.col("n_avail"), ASSIGNED)
        .when(
            F.col("requested") <= F.col("n_avail") + F.col("n_releasing"),
            WAIT_RELEASING,
        )
        .otherwise(FAIL_NOT_ENOUGH)
    )
    r = r.select(
        "node_id", "container_id", "requested",
        verdict.alias("verdict"),
        F.when(verdict == ASSIGNED, F.col("requested"))
        .otherwise(0).cast("long").alias("n_assigned"),
        (
            F.col("n_allowed")
            - F.when(verdict == ASSIGNED, F.col("requested")).otherwise(0)
        ).cast("long").alias("n_denied"),
    )
    free_rank = F.row_number().over(
        Window.partitionBy("node_id").orderBy("gpu_index", "minor")
    )
    free = devices.where(F.col("used_by").isNull()).select(
        "node_id", "gpu_index", "minor", free_rank.alias("rk")
    )
    assigned = (
        r.where(F.col("verdict") == ASSIGNED)
        .join(free, "node_id")
        .where(F.col("rk") <= F.col("requested"))
        .select(
            "node_id", "container_id", "verdict", "gpu_index", "minor",
            "n_assigned", "n_denied",
        )
    )
    others = r.where(F.col("verdict") != ASSIGNED).select(
        "node_id", "container_id", "verdict",
        F.lit(None).cast("int").alias("gpu_index"),
        F.lit(None).cast("int").alias("minor"),
        "n_assigned", "n_denied",
    )
    return assigned.unionByName(others)


def recover_gpus(mappings: DataFrame, devices: DataFrame) -> DataFrame:
    """recoverAssignedGpus:118-160 validation per persisted mapping.

    ``mappings``: (node_id, container_id, gpu_index int, minor int).
    Returns each mapping with verdict OK | NOT_ALLOWED (device not in
    the node's allowed list) | ALREADY_ASSIGNED (held by another
    container)."""
    dev = devices.select(
        "node_id", "gpu_index", "minor",
        F.col("used_by").alias("_holder"),
        F.lit(True).alias("_known"),
    )
    j = mappings.join(dev, ["node_id", "gpu_index", "minor"], "left")
    return j.select(
        "node_id", "container_id", "gpu_index", "minor",
        F.when(F.col("_known").isNull(), RECOVER_NOT_ALLOWED)
        .when(
            F.col("_holder").isNotNull()
            & (F.col("_holder") != F.col("container_id")),
            RECOVER_ALREADY_ASSIGNED,
        )
        .otherwise(RECOVER_OK)
        .alias("verdict"),
    )
