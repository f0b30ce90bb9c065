"""Retrieval evaluation metrics: recall@k, MRR, nDCG@k, MAP@k over a
ranked result table and a graded relevance table.

The evaluation half of the engine's retrieval stack (bm25_rank,
brute_force_topk, ivf_topk, rrf_fuse): every RAG / training-data
curation pipeline gates its retriever on exactly these numbers
(Manning/Raghavan/Schuetze IR ch.8; nDCG per Jarvelin & Kekalainen
2002 with the 2^rel - 1 gain form).

Definitions (per query, cutoff k):
- recall@k   = |top-k hits with grade > 0| / |relevant set|
- MRR        = 1 / rank of the first relevant hit (0 when none)
- DCG@k      = sum over top-k of (2^grade - 1) / log2(rank + 1)
- nDCG@k     = DCG@k / IDCG@k, where IDCG takes the k highest grades
               of the query's FULL relevant set (0 when none)
- AP@k (MAP) = sum over hit positions of precision@pos, divided by
               min(|relevant set|, k)

Scale shape: one equi-join of the rank-bounded result list (k rows
per query) against the relevance table on (query, doc) — the list
side is k-bounded so the join is list-sized; the relevant-set
denominator and the IDCG top-k are one groupBy + one window over the
relevance table, all hash-partitioned on query_id. Pure built-in
expressions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(
    ranked: DataFrame,
    rels: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    grade_col: str = "grade",
) -> DataFrame:
    """Per-query metrics table: (query_id, n_rel, n_hits, recall_at_k,
    mrr, ndcg_at_k, ap_at_k), each metric rounded to 6dp.

    ``ranked``: (query_id, doc_id, rank 1-based) — rows past `k` are
    ignored. ``rels``: (query_id, doc_id, grade int > 0) — the FULL
    graded relevant set per query (queries absent from `rels` score 0
    everywhere with n_rel = 0)."""
    r = ranked.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.col(rank_col).cast("int").alias("rank"),
    ).where(F.col("rank") <= k)
    g = rels.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.col(grade_col).cast("int").alias("grade"),
    ).where(F.col(grade_col) > 0)

    # Relevant-set size and ideal DCG from the k best grades.
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.col("grade").desc(), F.col("doc_id").asc()
    )
    ideal = (
        g.withColumn("__i", F.row_number().over(w_ideal))
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_rel"),
            F.sum(
                F.when(
                    F.col("__i") <= k,
                    (F.pow(F.lit(2.0), F.col("grade")) - 1.0)
                    / F.log2(F.col("__i") + 1.0),
                )
            ).alias("__idcg"),
        )
    )

    # ONE pass over `ranked` (r14): the hit-join output feeds a single
    # window + aggregate producing n_hits / first-hit rank / DCG / AP
    # numerator together, and the surviving query_id set doubles as the
    # output spine (the left join keeps every r row, so the groupBy
    # covers exactly distinct(r.query_id)). The previous shape consumed
    # `ranked` three times — per-query agg, AP window, spine distinct —
    # re-evaluating the (possibly expensive) retriever lineage per
    # branch; e.g. retrieval_metrics_hybrid ran both hybrid retriever
    # legs 3x. The conditional sums preserve the old NULL semantics
    # exactly: a query with zero hits aggregates to NULL, just as the
    # old missing ap_num/per_q row surfaced NULL through its left join.
    #
    # AP numerator: precision at each hit position = (number of hits
    # with rank <= this hit's rank) / rank — a rank-ordered running
    # count over the k-row-per-query hit list (bounded window).
    w_rank = Window.partitionBy("query_id").orderBy("rank")
    per_q = (
        r.join(g, ["query_id", "doc_id"], "left")
        .withColumn(
            "__hits_le",
            F.sum(
                F.when(F.col("grade").isNotNull(), 1).otherwise(0)
            ).over(w_rank.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("grade").isNotNull(), 1).otherwise(0)
            ).alias("n_hits"),
            F.min(
                F.when(F.col("grade").isNotNull(), F.col("rank"))
            ).alias("__first"),
            F.sum(
                F.when(
                    F.col("grade").isNotNull(),
                    (F.pow(F.lit(2.0), F.col("grade")) - 1.0)
                    / F.log2(F.col("rank") + 1.0),
                )
            ).alias("__dcg"),
            F.sum(
                F.when(
                    F.col("grade").isNotNull(),
                    F.col("__hits_le").cast("double") / F.col("rank"),
                )
            ).alias("__ap_num"),
        )
    )
    out = per_q.join(ideal, "query_id", "left")
    n_rel = F.coalesce(F.col("n_rel"), F.lit(0))
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0))
    return out.select(
        "query_id",
        n_rel.cast("long").alias("n_rel"),
        n_hits.cast("long").alias("n_hits"),
        F.round(
            F.when(n_rel > 0, n_hits.cast("double") / n_rel).otherwise(
                0.0
            ),
            6,
        ).alias("recall_at_k"),
        F.round(
            F.coalesce(1.0 / F.col("__first"), F.lit(0.0)), 6
        ).alias("mrr"),
        F.round(
            F.when(
                F.coalesce(F.col("__idcg"), F.lit(0.0)) > 0,
                F.coalesce(F.col("__dcg"), F.lit(0.0)) / F.col("__idcg"),
            ).otherwise(0.0),
            6,
        ).alias("ndcg_at_k"),
        F.round(
            F.when(
                n_rel > 0,
                F.coalesce(F.col("__ap_num"), F.lit(0.0))
                / F.least(n_rel, F.lit(k)).cast("double"),
            ).otherwise(0.0),
            6,
        ).alias("ap_at_k"),
    )
