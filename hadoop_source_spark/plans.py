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
    return df._jdf.queryExecution().executedPlan().toString()


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
