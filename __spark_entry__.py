"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (TPC-H Q1 shape) at sf0.001.
queries()     — every implemented operator from SURVEY.md §2 + llmops,
                ordered so all TPC-H shapes and one oracle-backed query
                per operator family sit in the driver's verification
                window (workload._WINDOW).
oracle_sql()  — DuckDB-equivalent SQL per query. Omitted only for the
                genuinely non-SQL rows (workload.ROWS_ONLY_BY_DESIGN):
                the approximate sketch/ANN suites, the TRAINED
                variants of semdedup / IVF knn / IVF bitext (k-means
                quantizer), quality_classifier_scores (iterative GD),
                PCA/unigram/BPE-segmentation, and MMR — each
                ground-truth-gated in tests/. The sketch/ANN/tokenizer
                families carry oracle-backed deterministic rows
                (sketch_ann_deterministic, ann_pq_topk,
                bpe_tokenize_stats), and round 14 added pinned slices
                semdedup_prune_pinned / knn_ivf_pinned /
                bitext_ivf_pinned / quality_scores_pinned /
                mmr_diversify_pinned that run the SAME distributed
                kernels with pinned centroids / weights / an unrolled
                greedy oracle, so the driver hash-checks each end to
                end.
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
