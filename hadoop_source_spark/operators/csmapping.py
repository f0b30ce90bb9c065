"""CapacityScheduler user/group queue-mapping placement — the
``yarn.scheduler.capacity.queue-mappings`` ``u:src:queue,g:src:queue``
language every CS cluster routes submissions through.

Reference semantics (`hadoop-yarn-server-resourcemanager/.../placement/
UserGroupMappingPlacementRule.java`):

- First matching mapping wins and is TERMINAL — a matched rule that
  cannot resolve returns null (no placement) rather than falling
  through (:100-201).
- ``u:%user:...`` matches every user (:104): with parent
  ``%primary_group``/``%secondary_group`` and leaf ``%user`` the
  GROUP QUEUE MUST EXIST (``getContextForGroupParent:226-251`` —
  missing/ambiguous group queue → null); leaf ``%user`` → the user's
  name; ``%primary_group`` → groups[0]; ``%secondary_group`` → the
  first LATER group that exists as a queue
  (``getSecondaryGroup:80-98`` — position not guaranteed upstream,
  existence-filtered; none → null here, modeled as NO_PLACEMENT).
- ``u:<name>:...`` exact-match user (:150-180): ``%secondary_group``
  with no eligible secondary explicitly returns null (:160-170).
- ``g:<name>:...`` matches when the group is ANY of the user's groups
  (:183-199); leaf ``%user`` → the user.
- No mapping matched → null: the caller falls back to the requested /
  default queue (modeled as DEFAULT_QUEUE).

Spark-first: the mapping list and queue set are conf-sized — the
whole cascade compiles to ONE codegen when-chain over array
expressions (array_contains / filter HOFs on the per-user group
list); no joins, no shuffles, map-side at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PLACED = "PLACED"
NO_PLACEMENT = "NO_PLACEMENT"
DEFAULT_QUEUE = "DEFAULT_QUEUE"

USER_M = "%user"
PRIMARY_M = "%primary_group"
SECONDARY_M = "%secondary_group"


@dataclass(frozen=True)
class QueueMapping:
    type: str                 # 'u' | 'g'
    source: str
    queue: str
    parent: str | None = None


def map_queue_placements(
    users: DataFrame,
    mappings: list[QueueMapping],
    queues: list[str],
    *,
    user_col: str = "user",
    groups_col: str = "groups",
) -> DataFrame:
    """Resolve every user's placement through the mapping chain.

    ``users``: (user, groups array<string> — ordered, groups[0] is
    the primary). Returns user + matched_rule, queue, parent_queue,
    action."""
    user = F.col(user_col)
    groups = F.col(groups_col)
    primary = F.get(groups, 0)
    secondaries = F.filter(
        F.slice(groups, 2, F.greatest(F.size(groups) - 1, F.lit(0))),
        lambda g: g.isin(*queues) if queues else F.lit(False),
    )
    secondary = F.when(F.size(secondaries) > 0, F.get(secondaries, 0))

    def exists(q: Column) -> Column:
        return q.isin(*queues) if queues else F.lit(False)

    def ctx(i: int, queue: Column, parent: Column | None) -> Column:
        return F.struct(
            F.lit(i).alias("idx"),
            queue.alias("queue"),
            (parent if parent is not None else F.lit(None).cast("string"))
            .alias("parent"),
        )

    null_ctx_fields = (
        F.lit(None).cast("string").alias("queue"),
        F.lit(None).cast("string").alias("parent"),
    )

    picked = F.lit(None).cast(
        "struct<idx:int,queue:string,parent:string>"
    )
    first = True
    for i, m in enumerate(mappings):
        if m.type == "u" and m.source == USER_M:
            applies = F.lit(True)
            if m.parent in (PRIMARY_M, SECONDARY_M) and m.queue == USER_M:
                grp = primary if m.parent == PRIMARY_M else secondary
                result = F.when(
                    grp.isNotNull() & exists(grp), ctx(i, user, grp)
                ).otherwise(F.struct(F.lit(i).alias("idx"), *null_ctx_fields))
            elif m.queue == USER_M:
                result = ctx(i, user, F.lit(m.parent))
            elif m.queue == PRIMARY_M:
                result = ctx(i, primary, F.lit(m.parent))
            elif m.queue == SECONDARY_M:
                result = F.when(
                    secondary.isNotNull(), ctx(i, secondary, F.lit(m.parent))
                ).otherwise(F.struct(F.lit(i).alias("idx"), *null_ctx_fields))
            else:
                result = ctx(i, F.lit(m.queue), F.lit(m.parent))
        elif m.type == "u":
            applies = user == m.source
            if m.queue == PRIMARY_M:
                result = ctx(i, primary, F.lit(m.parent))
            elif m.queue == SECONDARY_M:
                result = F.when(
                    secondary.isNotNull(), ctx(i, secondary, F.lit(m.parent))
                ).otherwise(F.struct(F.lit(i).alias("idx"), *null_ctx_fields))
            else:
                result = ctx(i, F.lit(m.queue), F.lit(m.parent))
        else:  # group mapping
            applies = F.array_contains(groups, m.source)
            if m.queue == USER_M:
                result = ctx(i, user, F.lit(m.parent))
            else:
                result = ctx(i, F.lit(m.queue), F.lit(m.parent))
        picked = (
            F.when(applies, result)
            if first
            else picked.when(applies, result)
        )
        first = False

    action = (
        F.when(picked.isNull(), F.lit(DEFAULT_QUEUE))
        .when(picked["queue"].isNull(), F.lit(NO_PLACEMENT))
        .otherwise(F.lit(PLACED))
    )
    return users.select(
        "*",
        picked["idx"].alias("matched_rule"),
        picked["queue"].alias("queue"),
        picked["parent"].alias("parent_queue"),
        action.alias("action"),
    )
