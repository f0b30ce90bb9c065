"""Every oracle-backed query must match DuckDB on the same parquet —
this mirrors the driver's CORRECTNESS gate (sf0.01 there, sf0.001 here
for speed; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to match)."""

from __future__ import annotations

import pytest

from hadoop_source_spark import workload
from hadoop_source_spark.oracle import compare

ORACLE_QUERIES = sorted(
    name for name, q in workload.QUERIES.items() if q.oracle
)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    q = workload.QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    res = compare(name, sdf, q.oracle, sf_dir)
    assert res.ok, f"{name}: {res.detail} (spark={res.n_spark}, duck={res.n_duck})"


def test_nonempty_results(spark, sf_dir):
    """Queries should exercise real data — empty results would make the
    hash-compare vacuous. A few are allowed to be empty at tiny SF."""
    allowed_empty = {"dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
                     "dedup_jaccard_suite", "anti_join_dormant_customers"}
    empties = []
    for name, q in workload.QUERIES.items():
        n = q.fn(spark, sf_dir).count()
        if n == 0 and name not in allowed_empty:
            empties.append(name)
    assert not empties, f"unexpectedly empty: {empties}"
