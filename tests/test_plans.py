"""Plan audits: assert each query engages the physical optimizations the
reference hand-built (SURVEY §4) — pushdown, pruning, broadcast, bounded
top-k — and that operator shuffle counts stay at their designed minimum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_source_spark import plans, workload
from hadoop_source_spark.operators import asof, skew

SF = "/root/testdata/sf0.001"


def test_q01_filter_pushed_and_pruned(spark):
    df = workload.QUERIES["q01_pricing_summary"].fn(spark, SF)
    pushed = " ".join(plans.pushed_filters(df))
    assert "LessThanOrEqual(l_shipdate" in pushed
    schemas = plans.read_schemas(df)
    # only the 7 needed columns, not all 11
    assert all("l_orderkey" not in s for s in schemas)


def test_q05_broadcasts_dims(spark):
    df = workload.QUERIES["q05_local_supplier"].fn(spark, SF)
    joins = plans.join_counts(df)
    assert joins["broadcast_hash"] >= 2  # region+nation at minimum
    assert joins["cartesian"] == 0


def test_q06_all_predicates_pushed(spark):
    df = workload.QUERIES["q06_forecast_revenue"].fn(spark, SF)
    pushed = " ".join(plans.pushed_filters(df))
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed, pushed


def test_top_k_is_bounded(spark):
    df = workload.QUERIES["top_k_orders"].fn(spark, SF)
    assert plans.has_take_ordered(df)


def test_asof_join_single_shuffle(spark):
    """The asof kernel must cost ONE shuffle (hash on the by-key), not a
    range join."""
    left = spark.range(100).select(
        F.col("id").alias("t"), (F.col("id") % 5).alias("g")
    )
    right = spark.range(50).select(
        (F.col("id") * 2).alias("t"), (F.col("id") % 5).alias("g")
    )
    df = asof.asof_join(left, right, on="t", by="g")
    joins = plans.join_counts(df)
    assert joins["broadcast_nested_loop"] == 0 and joins["cartesian"] == 0
    assert plans.shuffle_count(df) <= 2  # union shuffle + window partition


def test_salted_agg_equals_plain(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") % 101).cast("double").alias("v")
    )
    plain = {
        (r.k): (r.s, r.c, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.s, r.c, r.mn, r.mx)
        for r in skew.salted_agg(
            df,
            ["k"],
            {"s": ("v", "sum"), "c": ("v", "count"),
             "mn": ("v", "min"), "mx": ("v", "max")},
        ).collect()
    }
    assert plain == salted


def test_sql_surface_matches_dataframe(spark):
    """spark.sql over registered views is a first-class query surface."""
    from hadoop_source_spark.data import register_views

    register_views(spark, SF)
    sql_df = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    api_df = workload.QUERIES["q01_pricing_summary"].fn(spark, SF).select(
        "l_returnflag", "l_linestatus", "sum_qty", "count_order"
    )
    assert sorted(map(tuple, sql_df.collect())) == sorted(
        map(tuple, api_df.collect())
    )
