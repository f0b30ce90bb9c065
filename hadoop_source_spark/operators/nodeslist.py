"""RM include/exclude node-list refresh: the decision table behind
`yarn rmadmin -refreshNodes [-g [timeout]]`.

Reference semantics (`hadoop-yarn-server-resourcemanager/.../
NodesListManager.java`):

- ``isValidNode:500-507``: a host is valid iff the include list is
  EMPTY or contains it, AND the exclude list does not. (The reference
  also admits the resolved IP; this plan models the resolver as
  identity — hosts are already canonical — a documented deviation.)
- ``handleExcludeNodeList:281-367`` over the active node set:
  valid + DECOMMISSIONING → RECOMMISSION (:305-310); valid otherwise
  → no action. Excluded nodes under a GRACEFUL refresh use the
  per-host timeout from the exclude file when present, else the
  request/conf timeout (:315-317, :354-356): not yet
  DECOMMISSIONED/DECOMMISSIONING → gracefully decommission
  (:318-322); DECOMMISSIONING with a DIFFERENT timeout → re-emit the
  decommissioning event with the new timeout (:323-329); otherwise
  no action. Under a FORCEFUL refresh every excluded node that is
  not already DECOMMISSIONED is decommissioned — or SHUT DOWN when
  untracked (:333-336, :357-360).
- ``isUntrackedNode:609-619``: include list non-empty and the host on
  neither list — the node would never be admitted back, so it is
  shut down rather than parked in DECOMMISSIONED.

Spark-first: the include/exclude files are conf-sized — two broadcast
joins plus a broadcast include-count scalar, then one codegen
when-chain; no shuffle on the node side, a 100k-node fleet plans
map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RECOMMISSION = "RECOMMISSION"
GRACEFUL_DECOMMISSION = "GRACEFUL_DECOMMISSION"
UPDATE_TIMEOUT = "UPDATE_DECOMMISSIONING_TIMEOUT"
DECOMMISSION = "DECOMMISSION"
SHUTDOWN = "SHUTDOWN_UNTRACKED"
NO_ACTION = "NO_ACTION"


def refresh_nodes_plan(
    nodes: DataFrame,
    includes: DataFrame,
    excludes: DataFrame,
    *,
    graceful: bool,
    request_timeout: int,
) -> DataFrame:
    """Plan one refreshNodes pass.

    ``nodes``: the active set — (host, state, current_timeout int
    nullable: the node's decommissioning timeout). ``includes``:
    (host). ``excludes``: (host, exc_timeout int nullable — the
    per-host timeout an XML exclude file may carry).

    Returns (host, state, valid, action, timeout_to_use — set only on
    the two graceful decommissioning actions)."""
    inc = includes.select(F.col("host"), F.lit(True).alias("__inc"))
    exc = excludes.select("host", F.lit(True).alias("__exc"), "exc_timeout")
    n_inc = includes.agg(F.count(F.lit(1)).alias("__n_inc"))
    staged = (
        nodes.join(F.broadcast(inc), "host", "left")
        .join(F.broadcast(exc), "host", "left")
        .crossJoin(F.broadcast(n_inc))
    )
    included = (F.col("__n_inc") == 0) | F.col("__inc").isNotNull()
    excluded = F.col("__exc").isNotNull()
    valid = included & ~excluded
    untracked = (
        (F.col("__n_inc") > 0) & F.col("__inc").isNull() & ~excluded
    )
    touse = F.coalesce(F.col("exc_timeout"), F.lit(request_timeout))
    s = F.col("state")
    in_decom = s.isin("DECOMMISSIONED", "DECOMMISSIONING")
    if graceful:
        action = (
            F.when(valid & (s == "DECOMMISSIONING"), F.lit(RECOMMISSION))
            .when(valid, F.lit(NO_ACTION))
            .when(~in_decom, F.lit(GRACEFUL_DECOMMISSION))
            .when(
                (s == "DECOMMISSIONING")
                & ~F.col("current_timeout").eqNullSafe(touse),
                F.lit(UPDATE_TIMEOUT),
            )
            .otherwise(F.lit(NO_ACTION))
        )
    else:
        action = (
            F.when(valid & (s == "DECOMMISSIONING"), F.lit(RECOMMISSION))
            .when(valid, F.lit(NO_ACTION))
            .when(s == "DECOMMISSIONED", F.lit(NO_ACTION))
            .when(untracked, F.lit(SHUTDOWN))
            .otherwise(F.lit(DECOMMISSION))
        )
    return staged.select(
        "host",
        "state",
        valid.alias("valid"),
        action.alias("action"),
        F.when(
            action.isin(GRACEFUL_DECOMMISSION, UPDATE_TIMEOUT), touse
        )
        .cast("int")
        .alias("timeout_to_use"),
    )
