"""Table loaders for the driver's star schema (TESTDATA.md).

Actual parquet schemas (probed, they are narrower than FIXTURES.md):

    region    r_regionkey int, r_name str
    nation    n_nationkey int, n_name str, n_regionkey int
    customer  c_custkey long, c_name str, c_nationkey int, c_acctbal double,
              c_mktsegment str
    supplier  s_suppkey long, s_name str, s_nationkey int, s_acctbal double
    part      p_partkey long, p_name str, p_brand str, p_type str,
              p_size int, p_retailprice double
    orders    o_orderkey long, o_custkey long, o_orderstatus str,
              o_totalprice double, o_orderdate timestamp, o_orderpriority str
    lineitem  l_orderkey long, l_partkey long, l_suppkey long,
              l_linenumber int, l_quantity double, l_extendedprice double,
              l_discount double, l_tax double, l_returnflag str,
              l_linestatus str, l_shipdate timestamp
    events    event_id long, ts timestamp, user_id long, event_type str,
              value double, props str(json)
    documents doc_id long, text str, lang str, source str, n_chars long
    embeddings vec_id long, embedding array<float>, label int
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_source_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimensions small enough to broadcast at ANY scale factor (region/nation are
# bounded by geography; TPC-H caps them at 5 / 25 rows). customer/supplier/
# part grow with SF — those go through AQE's size-based broadcast decision
# instead of a hard hint.
ALWAYS_BROADCAST = {"region", "nation"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # The driver's parquet timestamp physical type has changed across
    # generations (TIMESTAMP(NANOS) → timestamp[us] no-tz). Normalize every
    # shape to plain TIMESTAMP (LTZ) so downstream unix_micros()/interval
    # arithmetic always analyzes:
    #  - bigint: nanosAsLong rescue for TIMESTAMP(NANOS) footers — truncate
    #    to micros (matches DuckDB's nanos→micros behavior).
    #  - TIMESTAMP_NTZ: lossless cast under the UTC session pin (belt and
    #    braces — tune() also disables NTZ inference, but the driver may
    #    hand us a session whose reads predate that conf).
    for field in df.schema.fields:
        if name == "events" and field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif field.dataType.simpleString() == "timestamp_ntz":
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
        elif field.dataType.simpleString() == "date" and field.name in (
            "ts", "o_orderdate", "l_shipdate",
        ):
            # date32 drift would break unix_micros()/interval arithmetic
            # exactly like the NTZ incident; midnight-UTC cast is lossless
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so spark.sql() works on them."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
