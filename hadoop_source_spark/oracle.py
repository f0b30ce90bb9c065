"""DuckDB oracle harness — mirrors the driver's correctness gate locally.

compare(): run a Spark DataFrame and a DuckDB SQL over the same sf_dir,
sort columns by name, sort rows, and compare values (floats with a small
tolerance locally; the queries themselves round on both sides so the
driver's exact value-hash also matches).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame

from hadoop_source_spark.data import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return v
    if isinstance(v, int):
        return v
    try:  # Decimal → float
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return str(v)


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in data]

    def cell_key(x):
        if x is None:
            return (0, "")
        if isinstance(x, float):
            # coarse rounding so engine fp noise can't reorder rows
            return (1, f"{round(x, 4):.4f}")
        return (1, str(x))

    out.sort(key=lambda row: tuple(cell_key(x) for x in row))
    return [cols[i] for i in order], out


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str
    n_spark: int
    n_duck: int


def compare(
    name: str,
    sdf: DataFrame,
    sql: str,
    sf_dir: str,
    rel_tol: float = 1e-7,
    abs_tol: float = 1e-7,
) -> CompareResult:
    spark_cols = sdf.columns
    spark_data = [tuple(r) for r in sdf.collect()]
    con = duck_connect(sf_dir)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_data = res.fetchall()
    con.close()

    if sorted(spark_cols) != sorted(duck_cols):
        return CompareResult(
            name, False,
            f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}",
            len(spark_data), len(duck_data),
        )
    if len(spark_data) != len(duck_data):
        return CompareResult(
            name, False,
            f"row count mismatch: spark={len(spark_data)} duck={len(duck_data)}",
            len(spark_data), len(duck_data),
        )
    _, s_rows = _rows(spark_cols, spark_data)
    _, d_rows = _rows(duck_cols, duck_data)
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for j, (a, b) in enumerate(zip(sr, dr)):
            if isinstance(a, float) or isinstance(b, float):
                fa = float(a) if a is not None else None
                fb = float(b) if b is not None else None
                if (fa is None) != (fb is None):
                    return CompareResult(
                        name, False, f"row {i} col {j}: {a!r} != {b!r}",
                        len(s_rows), len(d_rows),
                    )
                if fa is not None and not math.isclose(
                    fa, fb, rel_tol=rel_tol, abs_tol=abs_tol
                ):
                    return CompareResult(
                        name, False, f"row {i} col {j}: {a!r} !≈ {b!r}",
                        len(s_rows), len(d_rows),
                    )
            elif a != b:
                return CompareResult(
                    name, False, f"row {i} col {j}: {a!r} != {b!r}",
                    len(s_rows), len(d_rows),
                )
    return CompareResult(name, True, "ok", len(s_rows), len(d_rows))
