"""Plan-audit helpers: make "is this the plan we want?" a testable
assertion instead of a manual .explain() read.

The reference's physical optimizations (SURVEY §4) are all Catalyst/
Tungsten built-ins — these helpers verify each query actually engages
them: filters reaching the scan (MapFile index bisection analog), column
pruning (SequenceFile skipValBytes analog), broadcast vs shuffle join
choice, bounded top-k, and shuffle counts.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Physical-plan text. Classic sessions read it off the JVM
    queryExecution; under Spark Connect (no Py4J `_jdf`) fall back to
    capturing df.explain(), which the Connect client does support."""
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    except AttributeError:
        return _plan_via_explain(df)


def _plan_via_explain(df: DataFrame) -> str:
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries in the scan nodes (the plan string may
    truncate long lists with '...', so capture to end-of-list-or-line)."""
    return re.findall(r"PushedFilters: \[([^\]\n]*)", executed_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — the column-pruning audit."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", executed_plan(df))


def join_counts(df: DataFrame) -> dict[str, int]:
    plan = executed_plan(df)
    return {
        "broadcast_hash": plan.count("BroadcastHashJoin"),
        "sort_merge": plan.count("SortMergeJoin"),
        "shuffled_hash": plan.count("ShuffledHashJoin"),
        "broadcast_nested_loop": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
    }


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (AQE may later coalesce
    partitions but the exchange boundaries are fixed at planning)."""
    plan = executed_plan(df)
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in executed_plan(df)


def audit(df: DataFrame) -> dict:
    """One-call summary for notebooks/debugging."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "joins": join_counts(df),
        "shuffles": shuffle_count(df),
        "take_ordered": has_take_ordered(df),
    }


def advise(df: DataFrame) -> list[str]:
    """Actionable scale warnings for a DataFrame's physical plan — the
    .explain() review the 100-TB design rules prescribe, as an API.
    Empty list = no known anti-pattern. Rules:

    - CartesianProduct: O(n·m) row explosion.
    - Exchange SinglePartition feeding anything but a grand-total scalar
      aggregate (keys=[]): a global window/sort serializing data-sized
      input through one task.
    - BatchEvalPython: row-at-a-time pickled Python UDF on the hot path.
    - BroadcastNestedLoopJoin: theta join — fine for metadata-sized
      sides, fatal for data-sized ones.
    - A Filter above a parquet scan with NO pushed filters: the
      predicate never reached the reader (cast/UDF in the predicate?).
    """
    plan = executed_plan(df)
    lines = plan.splitlines()
    out: list[str] = []
    if "CartesianProduct" in plan:
        out.append(
            "cartesian product: give the join an equi-key, or broadcast a "
            "provably bounded side"
        )
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            parent = lines[i - 1] if i else ""
            if not re.search(r"HashAggregate\(keys=\[\]", parent):
                out.append(
                    "single-partition exchange feeding a non-scalar stage: "
                    "a global Window/Sort is serializing data through one "
                    "task — partition the window or bound its input"
                )
                break
    if "BatchEvalPython" in plan:
        out.append(
            "row-at-a-time Python UDF: rewrite with built-ins or an "
            "Arrow-batched pandas_udf/mapInPandas"
        )
    if "BroadcastNestedLoopJoin" in plan:
        out.append(
            "broadcast nested-loop (theta) join: acceptable only when one "
            "side is metadata-sized by construction"
        )
    if "Filter (" in plan or re.search(r"\bFilter\b", plan):
        pushed = pushed_filters(df)
        if pushed and all(p.strip() == "" for p in pushed):
            out.append(
                "filter present but nothing pushed to the parquet scan: "
                "check for casts/UDFs wrapping the predicate column"
            )
    return out
