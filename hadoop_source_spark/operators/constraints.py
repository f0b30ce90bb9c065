"""YARN rich placement constraints: can a scheduling request's
constraint tree be satisfied by a candidate node?

Reference semantics (`hadoop-yarn-server-resourcemanager/.../scheduler/
constraint/`):

- ``PlacementConstraintsUtil.canSatisfyConstraints:297-329``: a null
  constraint is trivially satisfied; a SingleConstraint requires ALL
  of its target expressions to hold (:216-251); And requires all
  children (:262-274); Or requires any child (:285-295).
- Allocation-tag expressions (:74-116): the min-cardinality check
  runs only when minCardinality > 0, the max check only when
  maxCardinality < Integer.MAX_VALUE; the scope picks the node or
  rack tag store; the verdict is ``min <= card_min AND card_max <=
  max`` where ``card_min``/``card_max`` reduce the per-tag counts
  with Long::min / Long::max (``AllocationTagsManager.getCardinality:
  176-199`` — a tag absent from the store counts 0).
- Namespaces (``TargetApplicationsNamespace``): ``self`` = the
  requesting app's own tags, ``not-self`` = every other app's,
  ``all`` = the global store (sum over apps), ``app-id/<id>`` = one
  specific app, ``app-tag/<tag>`` = the union of apps carrying that
  APPLICATION tag (``AllocationTagsManager.aggregateAllocationTags:
  306-333`` merges per-app stores by summing counts).
- Node-partition expressions (:118-132): an empty/absent value set
  requires the node to sit in NO_LABEL (''); otherwise the (single)
  value must equal the node's partition.
- Node-attribute expressions (:149-214): ``NodeAttribute`` equality
  is KEY-only (``NodeAttributePBImpl.equals:146-158``), so a node
  lacking the requested key is accepted iff the opcode is NE
  (java != 1.8 schedules onto nodes with no java at all); a present
  key compares values under EQ / NE, and any other opcode (NO_OP)
  never matches a present attribute.

Constraint-tree shape: the engine takes the tree in a two-level
normal form — a request-level combinator (AND | OR) over groups,
each group an AND of single-expression terms. This expresses every
shape the reference processor emits after SingleConstraintTransformer
(single constraints, And-of-singles, Or-of-singles, Or-of-Ands);
deeper nesting must be flattened by the caller.

Spark-first plan: per-app tag counts aggregate ONCE on (node, tag)
keys, then the all/rack/app-tag stores derive from that small result;
the unified count store is cluster-sized and broadcastable. Candidate
x term rows take at most two broadcast-joins against the store (one
primary lookup, one self-subtraction for not-self), a per-term
min/max aggregate, and two boolean rollups keyed on (req, node) —
every wide exchange is keyed on request or (entity, tag) families, so
the plan scales linearly with candidates x terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CARD = 2147483647  # Integer.MAX_VALUE sentinel: "no max check"

_TERM_COLS = [
    "req_id", "group_id", "term_id", "scope", "target_type",
    "namespace", "target_key", "target_values", "min_card",
    "max_card", "attr_opcode",
]


def _tag_stores(alloc_tags: DataFrame, nodes: DataFrame,
                app_tags: DataFrame) -> DataFrame:
    """Unified cardinality store: (kind node|rack, entity, tag,
    ns app|apptag|all, key, cnt). Each raw allocation row explodes
    into its (kind, ns) projections BEFORE aggregating, so the whole
    store is ONE groupBy — a single shuffle over the raw rows
    instead of six per-shape re-aggregations of the same base."""
    base = alloc_tags.join(
        F.broadcast(nodes.select("node_id", "rack")), "node_id"
    )

    def shape(kind, entity, ns, key):
        return F.struct(
            F.lit(kind).alias("kind"), entity.alias("entity"),
            F.lit(ns).alias("ns"), key.alias("key"),
        )

    node, rack = F.col("node_id"), F.col("rack")
    direct = base.select(
        F.explode(
            F.array(
                shape("node", node, "app", F.col("app_id")),
                shape("rack", rack, "app", F.col("app_id")),
                shape("node", node, "all", F.lit("")),
                shape("rack", rack, "all", F.lit("")),
            )
        ).alias("s"),
        "tag", "cnt",
    )
    tagged = base.join(app_tags, "app_id").select(
        F.explode(
            F.array(
                shape("node", node, "apptag", F.col("app_tag")),
                shape("rack", rack, "apptag", F.col("app_tag")),
            )
        ).alias("s"),
        "tag", "cnt",
    )
    return (
        direct.unionByName(tagged)
        .select("s.kind", "s.entity", "tag", "s.ns", "s.key", "cnt")
        .groupBy("kind", "entity", "tag", "ns", "key")
        .agg(F.sum("cnt").alias("cnt"))
    )


def placement_matrix(
    candidates: DataFrame,
    requests: DataFrame,
    terms: DataFrame,
    nodes: DataFrame,
    node_attrs: DataFrame,
    alloc_tags: DataFrame,
    app_tags: DataFrame,
) -> DataFrame:
    """Satisfaction verdict per (scheduling request, candidate node).

    ``candidates``: (req_id, node_id). ``requests``: (req_id, app_id,
    combinator 'AND'|'OR'). ``terms``: (req_id, group_id, term_id,
    scope 'node'|'rack', target_type 'allocation_tag'|
    'node_partition'|'node_attribute', namespace 'self'|'not-self'|
    'all'|'app-id/<id>'|'app-tag/<tag>', target_key, target_values
    array<string>, min_card int, max_card int [MAX_CARD = unchecked],
    attr_opcode 'EQ'|'NE'|'NO_OP'). ``nodes``: (node_id, rack,
    partition — '' is NO_LABEL). ``node_attrs``: (node_id, attr_key,
    attr_value), one row per key. ``alloc_tags``: (app_id, node_id,
    tag, cnt). ``app_tags``: (app_id, app_tag).

    Returns (req_id, node_id, satisfied boolean); a request with no
    terms is trivially satisfied (canSatisfyConstraints:302-306)."""
    # Lineage cuts (r14, guide §5/§2.4): the pre-cut plan evaluated
    # candidates⋈requests TWICE (base + the final verdict join) and
    # `base` THREE times (one per target_type branch) — with `terms`
    # itself a multi-branch union, that re-inlining cost 28 scans of
    # the source in one plan (plans/r14/placement_constraint_matrix_
    # before.txt, zero ReusedExchange). Lazy localCheckpoints make each
    # shared derivation evaluate once; the three branches filter base
    # DISJOINTLY (every term has exactly one target_type), so one
    # materialized pass is strictly less work than three rebuilds.
    cand_req = candidates.join(requests, "req_id").localCheckpoint(
        eager=False
    )
    base = (
        cand_req.join(terms.select(*_TERM_COLS), "req_id")
        .join(F.broadcast(nodes), "node_id")
    ).localCheckpoint(eager=False)

    # --- allocation-tag terms: explode tags, look up cardinalities.
    tagt = base.where(F.col("target_type") == "allocation_tag")
    ns_type = F.split(F.col("namespace"), "/", 2).getItem(0)
    ns_arg = F.split(F.col("namespace"), "/", 2).getItem(1)
    tagt = tagt.withColumn(
        "_tag",
        F.explode(
            F.when(
                F.size("target_values") >= 1, F.col("target_values")
            ).otherwise(
                F.raise_error(
                    "allocation_tag term requires non-empty "
                    "target_values (untagged cardinality queries are "
                    "not modeled)"
                )
            )
        ),
    ).select(
        "req_id", "node_id", "group_id", "term_id", "min_card",
        "max_card", "_tag",
        F.when(F.col("scope") == "rack", F.col("rack"))
        .otherwise(F.col("node_id"))
        .alias("_entity"),
        F.col("scope").alias("_kind"),
        F.when(ns_type.isin("all", "not-self"), F.lit("all"))
        .when(ns_type == "app-tag", F.lit("apptag"))
        .otherwise(F.lit("app"))
        .alias("_ns"),
        F.when(ns_type == "self", F.col("app_id"))
        .when(ns_type.isin("app-id", "app-tag"), ns_arg)
        .otherwise(F.lit(""))
        .alias("_key"),
        (ns_type == "not-self").alias("_sub_self"),
        F.col("app_id").alias("_self_app"),
    )
    # consumed twice (primary + own) — cut the store's lineage too;
    # it is cluster-state-sized (tags × nodes), never corpus-sized.
    store = _tag_stores(alloc_tags, nodes, app_tags).localCheckpoint(
        eager=False
    )
    primary = store.select(
        F.col("kind").alias("_kind"), F.col("entity").alias("_entity"),
        F.col("tag").alias("_tag"), F.col("ns").alias("_ns"),
        F.col("key").alias("_key"), F.col("cnt").alias("_cnt"),
    )
    own = store.where(F.col("ns") == "app").select(
        F.col("kind").alias("_kind"), F.col("entity").alias("_entity"),
        F.col("tag").alias("_tag"), F.col("key").alias("_self_app"),
        F.col("cnt").alias("_own"),
    )
    tagt = (
        tagt.join(
            F.broadcast(primary),
            ["_kind", "_entity", "_tag", "_ns", "_key"],
            "left",
        )
        .join(
            F.broadcast(own),
            ["_kind", "_entity", "_tag", "_self_app"],
            "left",
        )
        .withColumn(
            "_card",
            F.coalesce(F.col("_cnt"), F.lit(0))
            - F.when(
                F.col("_sub_self"), F.coalesce(F.col("_own"), F.lit(0))
            ).otherwise(0),
        )
    )
    tag_ok = (
        tagt.groupBy("req_id", "node_id", "group_id", "term_id")
        .agg(
            F.min("_card").alias("_minc"),
            F.max("_card").alias("_maxc"),
            F.first("min_card").alias("min_card"),
            F.first("max_card").alias("max_card"),
        )
        .select(
            "req_id", "node_id", "group_id",
            (
                ((F.col("min_card") <= 0)
                 | (F.col("_minc") >= F.col("min_card")))
                & ((F.col("max_card") == MAX_CARD)
                   | (F.col("_maxc") <= F.col("max_card")))
            ).alias("term_ok"),
        )
    )

    # --- node-partition terms: no joins beyond the node row.
    partt = base.where(F.col("target_type") == "node_partition").select(
        "req_id", "node_id", "group_id",
        F.when(
            F.col("target_values").isNull()
            | (F.size("target_values") == 0),
            F.col("partition") == "",
        )
        .otherwise(
            F.element_at("target_values", 1) == F.col("partition")
        )
        .alias("term_ok"),
    )

    # --- node-attribute terms: key-equality lookup, then opcode.
    attrt = (
        base.where(F.col("target_type") == "node_attribute")
        .join(
            F.broadcast(
                node_attrs.withColumnRenamed("attr_key", "target_key")
            ),
            ["node_id", "target_key"],
            "left",
        )
        .select(
            "req_id", "node_id", "group_id",
            F.when(
                F.col("attr_value").isNull(),
                F.col("attr_opcode") == "NE",
            )
            .when(
                F.col("attr_opcode") == "EQ",
                F.col("attr_value") == F.element_at("target_values", 1),
            )
            .when(
                F.col("attr_opcode") == "NE",
                F.col("attr_value") != F.element_at("target_values", 1),
            )
            .otherwise(F.lit(False))  # NO_OP never matches a present key
            .alias("term_ok"),
        )
    )

    groups = (
        tag_ok.unionByName(partt)
        .unionByName(attrt)
        .groupBy("req_id", "node_id", "group_id")
        .agg(F.min("term_ok").alias("group_ok"))
    )
    verdicts = groups.groupBy("req_id", "node_id").agg(
        F.min("group_ok").alias("_all"), F.max("group_ok").alias("_any")
    )
    return (
        cand_req.select("req_id", "node_id", "combinator")
        .join(verdicts, ["req_id", "node_id"], "left")
        .select(
            "req_id", "node_id",
            F.when(F.col("_all").isNull(), F.lit(True))
            .when(F.col("combinator") == "OR", F.col("_any"))
            .otherwise(F.col("_all"))
            .alias("satisfied"),
        )
    )
