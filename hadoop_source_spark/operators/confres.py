"""Configuration resolution: layered resources, final keys,
deprecation aliases, ${var} expansion.

Reference semantics (`common/conf/Configuration.java` — the single
most-used class in the reference tree):
- resources load IN ORDER and later values override earlier ones,
  EXCEPT that once a key is loaded `final` its value FREEZES — every
  later assignment (final or not) is ignored with a warning
  (`loadProperty` / `finalParameters`, :314);
- deprecated key names alias onto their replacements
  (`DeprecationDelta`, :424-531) — both names address one property;
- values expand `${var}` references against the resolved map, ONE
  substitution per round, at most `MAX_SUBST` = 20 rounds (:1037,
  `substituteVars` :1134); an UNBOUND variable stays as the literal
  `${var}` text.

Spark-first: resolution is one groupBy over the property table
(first-final via min_by over final rows, else last via max_by) after
a broadcast deprecation rewrite; expansion is a bounded driver loop
of broadcast self-joins (config tables are control-plane-sized; the
loop-control count per round is the same documented pattern as
editlog's pointer doubling), each round substituting the FIRST
`${var}` exactly as the reference does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_SUBST = 20
_VAR_RE = r"\$\{([^}]*)\}"


def resolve_layers(
    props: DataFrame,
    deprecations: DataFrame | None = None,
) -> DataFrame:
    """props: (resource_order int, name, value, final bool) — one row
    per assignment across the layered resources. deprecations:
    (old_name, new_name). Output per canonical name: value, final,
    source_order (the assignment that won), n_ignored (assignments
    discarded because an earlier final froze the key)."""
    p = props
    if deprecations is not None:
        dep = F.broadcast(
            deprecations.select(
                F.col("old_name").alias("name"),
                F.col("new_name").alias("__canon"),
            )
        )
        p = p.join(dep, "name", "left").withColumn(
            "name", F.coalesce("__canon", "name")
        ).drop("__canon")
    first_final = F.min_by(
        F.struct("value", "resource_order"),
        F.when(F.col("final"), F.col("resource_order")),
    )
    last_any = F.max_by(F.struct("value", "resource_order"), "resource_order")
    g = p.groupBy("name").agg(
        first_final.alias("__ff"),
        last_any.alias("__la"),
        F.max(F.col("final").cast("int")).alias("__anyfinal"),
        F.collect_list("resource_order").alias("__orders"),
    )
    won = F.when(F.col("__anyfinal") == 1, F.col("__ff")).otherwise(
        F.col("__la")
    )
    return g.select(
        "name",
        won["value"].alias("value"),
        (F.col("__anyfinal") == 1).alias("final"),
        won["resource_order"].alias("source_order"),
        F.size(
            F.filter(
                "__orders",
                lambda o: o > won["resource_order"],
            )
        ).alias("n_ignored"),
    )


def expand_vars(resolved: DataFrame, max_subst: int = MAX_SUBST) -> DataFrame:
    """${var} expansion over a resolved (name, value) map: one FIRST-
    occurrence substitution per round, up to `max_subst` rounds;
    unbound variables keep their literal text (the reference's exact
    loop, substituteVars :1134). If a BOUND variable still remains
    after `max_subst` rounds — a reference cycle like a=${b}, b=${a},
    or a chain deeper than the budget — this RAISES exactly as the
    reference does ("Variable substitution depth too large", :1146)
    instead of returning quietly partial values. Extra columns pass
    through."""
    cur = resolved.localCheckpoint(eager=False)
    for _ in range(max_subst):
        var = F.regexp_extract("value", _VAR_RE, 1)
        pending = cur.withColumn("__var", var).withColumn(
            "__has", F.col("__var") != ""
        )
        lookup = F.broadcast(
            cur.select(
                F.col("name").alias("__var"), F.col("value").alias("__sub")
            )
        )
        joined = pending.join(lookup, "__var", "left")
        token = F.concat(F.lit("${"), F.col("__var"), F.lit("}"))
        idx = F.instr("value", token)
        new_val = F.when(
            F.col("__has") & F.col("__sub").isNotNull(),
            F.concat(
                F.substring(F.col("value"), F.lit(1), idx - 1),
                F.col("__sub"),
                F.substring(
                    F.col("value"),
                    idx + F.length(token),
                    F.lit(1 << 30),
                ),
            ),
        ).otherwise(F.col("value"))
        stepped = joined.withColumn("__new", new_val)
        changed = stepped.filter(F.col("__new") != F.col("value")).count()
        cur = stepped.select(
            *[c for c in resolved.columns if c != "value"],
            F.col("__new").alias("value"),
        ).localCheckpoint(eager=False)
        if changed == 0:
            break
    # a BOUND ${var} surviving the loop — depth exhausted, a cycle, or
    # a self-referential fixed point — is an error in the reference
    # regardless of which: substituteVars loops MAX_SUBST times and
    # throws (:1146); only UNBOUND vars stay as literal text.
    lookup = F.broadcast(cur.select(F.col("name").alias("__var")))
    still = (
        cur.withColumn("__var", F.regexp_extract("value", _VAR_RE, 1))
        .filter(F.col("__var") != "")
        .join(lookup, "__var", "left_semi")
        .select("name")
        .limit(20)
        .collect()
    )
    if still:
        names = ", ".join(sorted(r.name for r in still))
        raise ValueError(
            f"Variable substitution depth too large: {max_subst} "
            f"(unresolved: {names})"
        )
    return cur.select(*resolved.columns)
