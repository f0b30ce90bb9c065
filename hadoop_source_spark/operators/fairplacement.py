"""FairScheduler queue-placement policy: the ordered rule chain that
assigns an incoming application to a queue.

Reference semantics (`scheduler/fair/QueuePlacementPolicy.java:54` and
`resourcemanager/placement/*.java`):
- rules evaluate IN ORDER; the first rule that produces a queue wins
  (PlacementManager iterates `getPlacementForApp` until non-null);
- rule catalog (QueuePlacementPolicy RULES map, :75-86 — the key is
  the config name, the flag its terminal state):
  * specified (SpecifiedPlacementRule.java:55): the queue the app
    names, unless it is "default"; never creates, so it falls through
    when the named queue does not exist;
  * user (UserPlacementRule.java:43): root.<cleanName(user)>;
  * primaryGroup (PrimaryGroupPlacementRule.java:60):
    root.<cleanName(primary group)>;
  * secondaryGroupExistingQueue
    (SecondaryGroupExistingPlacementRule.java:63): the FIRST
    secondary group whose queue ALREADY EXISTS; never creates;
  * default (DefaultPlacementRule.java:104): a configured fallback
    (root.default unless overridden);
  * reject (RejectPlacementRule): terminal REJECT;
- `cleanName` (FairQueuePlacementUtils.java:53) trims and replaces
  '.' with '_dot_' (a dot would split the queue path); `assureRoot`
  (:71) prefixes 'root.' when absent;
- config validation (updateRuleSet :100-121): a TERMINAL rule before
  the last makes later rules unreachable → configuration error; the
  last rule MUST be terminal ("could get past last queue placement
  rule without assigning"). A rule is terminal when it always
  resolves: reject always; user/primaryGroup/default when their
  create flag is on; specified/secondaryGroupExistingQueue never.

Spark-first: the whole chain compiles into ONE cascading
when-expression over the app table — rule order becomes expression
order, queue-existence tests are conf-sized literal lists (the real
policy reads them from the allocation file), zero joins, zero UDFs,
pure codegen; placing a billion app submissions is a scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NEVER_TERMINAL = {"specified", "secondaryGroupExistingQueue"}
_ALWAYS_TERMINAL = {"reject"}


def _clean(col: Column) -> Column:
    """cleanName: trim + '.' → '_dot_' (FairQueuePlacementUtils:53)."""
    return F.regexp_replace(F.trim(col), r"\.", "_dot_")


def _assure_root(col: Column) -> Column:
    """assureRoot (:71): prefix 'root.' unless already rooted."""
    return F.when(
        col.startswith("root."), col
    ).otherwise(F.concat(F.lit("root."), col))


def _is_terminal(rule: dict) -> bool:
    name = rule["name"]
    if name in _ALWAYS_TERMINAL:
        return True
    if name in _NEVER_TERMINAL:
        return False
    return bool(rule.get("create", True))


def place_apps(
    apps: DataFrame,
    rules: list[dict],
    existing_queues: list[str],
    default_queue: str = "root.default",
) -> DataFrame:
    """Assign every app to a queue through the ordered rule chain.

    apps: (app_id, user, primary_group, secondary_groups
    array<string>, specified_queue nullable). rules: ordered list of
    {'name': <rule>, 'create': bool} dicts (create defaults True,
    exactly the allocation-file attribute). existing_queues: the
    configured queue list (conf-sized — compiled into the
    expression). Output adds assigned_queue (null on REJECT),
    matched_rule, created (the queue did not pre-exist — the
    scheduler would create it).

    Raises on the reference's two config errors (updateRuleSet
    :100-121): a terminal rule before the last, or a non-terminal
    final rule."""
    if not rules:
        raise ValueError("empty placement rule set")
    for i, rule in enumerate(rules[:-1]):
        if _is_terminal(rule):
            raise ValueError(
                f"Rules after rule {i + 1} in queue placement policy "
                "can never be reached"
            )
    if not _is_terminal(rules[-1]):
        raise ValueError(
            "Could get past last queue placement rule without assigning"
        )

    existing = sorted(set(existing_queues))
    exists = lambda c: c.isin(*existing) if existing else F.lit(False)  # noqa: E731

    queue_expr = F.lit(None).cast("string")
    rule_expr = F.lit(None).cast("string")
    # build the cascade back-to-front so earlier rules take precedence
    for rule in reversed(rules):
        name = rule["name"]
        create = bool(rule.get("create", True))
        if name == "specified":
            cand = _assure_root(_clean(F.col("specified_queue")))
            ok = (
                F.col("specified_queue").isNotNull()
                & (F.trim(F.col("specified_queue")) != "default")
                & exists(cand)  # never creates
            )
        elif name == "user":
            cand = F.concat(F.lit("root."), _clean(F.col("user")))
            ok = F.lit(create) | exists(cand)
        elif name == "primaryGroup":
            cand = F.concat(F.lit("root."), _clean(F.col("primary_group")))
            ok = F.lit(create) | exists(cand)
        elif name == "secondaryGroupExistingQueue":
            hits = F.filter(
                F.col("secondary_groups"),
                lambda g: exists(F.concat(F.lit("root."), _clean(g))),
            )
            cand = F.concat(F.lit("root."), _clean(F.get(hits, 0)))
            ok = F.size(hits) > 0
        elif name == "default":
            cand = _assure_root(
                F.lit(rule.get("queue", default_queue))
            )
            ok = F.lit(create) | exists(cand)
        elif name == "reject":
            cand = F.lit(None).cast("string")
            ok = F.lit(True)
        else:
            raise ValueError(f"unknown placement rule: {name!r}")
        queue_expr = F.when(ok, cand).otherwise(queue_expr)
        rule_expr = F.when(ok, F.lit(name)).otherwise(rule_expr)

    assigned = queue_expr
    return apps.select(
        *apps.columns,
        assigned.alias("assigned_queue"),
        rule_expr.alias("matched_rule"),
        (
            assigned.isNotNull() & ~exists(assigned)
        ).alias("created"),
    )
