"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (TPC-H Q1 shape) at sf0.001.
queries()     — every implemented operator from SURVEY.md §2 + llmops,
                ordered so all TPC-H shapes and one oracle-backed query
                per operator family sit in the driver's verification
                window (workload._WINDOW).
oracle_sql()  — DuckDB-equivalent SQL per query. Omitted only for the
                genuinely non-SQL rows: the approximate sketch/ANN
                suites (sketch_suite, ann_cosine_approx — error bounds
                / recall pytest-gated; their deterministic slices ARE
                oracle-backed via sketch_ann_deterministic, the PQ path
                via ann_pq_topk's in-plan recall gate, and the BPE
                tokenizer via bpe_tokenize_stats' reconstruction gate),
                semdedup (clustered greedy pruning), and
                quality_classifier_scores (iterative GD training; its
                0.95-accuracy gate holds on planted separable corpora
                in tests, not on the near-chance testdata labels) —
                each validated in tests/ against ground truth instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_source_spark import workload  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    return workload.oracle_sql()
