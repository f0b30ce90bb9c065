"""NM elastic-memory OOM handler: when the YARN cgroup hits OOM (the
case the polling monitor deliberately skips — operators/contmon.py's
SKIP_CGROUP_OOM), which containers get SIGKILLed, in what order.

Reference semantics (`hadoop-yarn-server-nodemanager/.../linux/
resources/DefaultOOMHandler.java`):

- Candidates are the node's RUNNING containers (:227-236 — killing a
  not-yet-running container frees nothing).
- A container is out of limit when its cgroup usage exceeds its
  requested memory in bytes (``isContainerOutOfLimit:77-105``; the
  stat file is memory.memsw.usage_in_bytes under virtual enforcement,
  memory.usage_in_bytes otherwise :63-66; an unreadable stat counts
  as within limit).
- Kill order (``ContainerCandidate.compareTo:277-296``):
  OPPORTUNISTIC containers (a non-null token with OPPORTUNISTIC
  execution type, :330-334) strictly before GUARANTEED; within a
  type, out-of-limit before within-limit; within that, the LATER
  launch first (least accumulated work, :175-179). The handler kills
  down this order until the kernel clears under_oom (:183-211).
- No running candidate at all is a hard give-up
  (YarnRuntimeException, :197-205).

The reference's sort is stable over an unordered container map; the
engine adds a container-id tiebreak so ranks are deterministic.

Spark-first: one rank window per node over the candidate ordering —
no UDFs; a cluster of nodes ranks in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CANDIDATE = "CANDIDATE"
GIVE_UP = "GIVE_UP"


def oom_kill_order(
    containers: DataFrame, *, enforce_virtual: bool = False
) -> DataFrame:
    """Kill ordering per node under cgroup OOM.

    ``containers``: (node_id, container_id, running boolean,
    exec_type string nullable — OPPORTUNISTIC | GUARANTEED | null for
    a missing token, launch_time long, mem_usage long nullable,
    memsw_usage long nullable, request_mb long).

    Returns (node_id, container_id nullable, verdict CANDIDATE |
    GIVE_UP, opportunistic boolean, out_of_limit boolean, kill_rank
    int) — one CANDIDATE row per running container in kill order, or
    one GIVE_UP row for a node whose OOM has no running container to
    kill."""
    usage = F.col("memsw_usage") if enforce_virtual else F.col(
        "mem_usage"
    )
    opportunistic = F.coalesce(
        F.col("exec_type") == "OPPORTUNISTIC", F.lit(False)
    )
    out_of_limit = F.coalesce(
        usage > F.col("request_mb") * 1024 * 1024, F.lit(False)
    )
    running = containers.where(F.col("running")).select(
        "node_id", "container_id",
        opportunistic.alias("opportunistic"),
        out_of_limit.alias("out_of_limit"),
        "launch_time",
    )
    ranked = running.select(
        "node_id", "container_id",
        F.lit(CANDIDATE).alias("verdict"),
        "opportunistic", "out_of_limit",
        F.row_number().over(
            Window.partitionBy("node_id").orderBy(
                F.col("opportunistic").desc(),
                F.col("out_of_limit").desc(),
                F.col("launch_time").desc(),
                "container_id",
            )
        ).alias("kill_rank"),
    )
    give_up = (
        containers.groupBy("node_id")
        .agg(F.max(F.col("running").cast("int")).alias("_any"))
        .where(F.col("_any") == 0)
        .select(
            "node_id",
            F.lit(None).cast("string").alias("container_id"),
            F.lit(GIVE_UP).alias("verdict"),
            F.lit(False).alias("opportunistic"),
            F.lit(False).alias("out_of_limit"),
            F.lit(None).cast("int").alias("kill_rank"),
        )
    )
    return ranked.unionByName(give_up)
