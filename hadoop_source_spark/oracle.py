"""DuckDB oracle harness — mirrors the driver's correctness gate locally.

compare(): run a Spark DataFrame and a DuckDB SQL over the same sf_dir,
sort columns by name, sort rows, and compare values EXACTLY, including
the numeric type class.  The driver hashes typed values after an Arrow /
pandas conversion, so an int64 on the Spark side and a float64 on the
DuckDB side (e.g. DuckDB ``sum(INTEGER)`` returning HUGEINT, which pandas
coerces to float64) must FAIL here even though the numbers are equal —
that exact mismatch is invisible to a tolerance-based compare and was the
root cause of three driver hash failures in round 1.

To reproduce the driver's coercions we fetch the DuckDB result through
``.arrow()`` rather than ``fetchall()``: Arrow keeps nullable BIGINT as
int64 (round-1 driver evidence: kv_get_closest, int keys with NULLs,
hashed green) but exports HUGEINT as decimal128 → Decimal → float here,
so the un-cast-integer-SUM failure class is still caught.  ``fetchall()``
returns HUGEINT as a Python int and hides it; ``.df()`` via pandas
coerces every nullable int column to float64, which is stricter than the
driver and produces false alarms.
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
    """Normalize a cell to (type_class, value) preserving int-vs-float."""
    import datetime
    import decimal

    import numpy as np

    if v is None:
        return None
    # pandas NaN / NaT
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, np.floating):
        fv = float(v)
        return None if math.isnan(fv) else fv
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, decimal.Decimal):
        # Decimal survives pandas as object; the driver's hash treats it as
        # its own type — we coerce to float to match Arrow's usual behavior.
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    return str(v)


def _type_class(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    return "str"


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in data]

    def cell_key(x):
        if x is None:
            return (0, "")
        if isinstance(x, bool):
            return (1, str(x))
        if isinstance(x, float):
            # exact repr: sort precision == comparison precision, so rows
            # can't pair differently on the two sides unless values differ
            # (in which case some row fails anyway)
            return (2, f"{x:.17g}")
        return (2, str(x))

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
) -> CompareResult:
    spark_cols = sdf.columns
    spark_data = [tuple(r) for r in sdf.collect()]
    con = duck_connect(sf_dir)
    tbl = con.execute(sql).arrow()
    con.close()
    duck_cols = list(tbl.column_names)
    duck_data = [
        tuple(d[c] for c in duck_cols) for d in tbl.to_pylist()
    ]

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
    cols, s_rows = _rows(spark_cols, spark_data)
    _, d_rows = _rows(duck_cols, duck_data)
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for j, (a, b) in enumerate(zip(sr, dr)):
            ta, tb = _type_class(a), _type_class(b)
            if ta != tb:
                return CompareResult(
                    name, False,
                    f"row {i} col {cols[j]}: TYPE {ta}({a!r}) != {tb}({b!r}) "
                    "— driver hashes typed values; cast both sides identically",
                    len(s_rows), len(d_rows),
                )
            if a != b:
                return CompareResult(
                    name, False,
                    f"row {i} col {cols[j]}: {a!r} != {b!r}",
                    len(s_rows), len(d_rows),
                )
    return CompareResult(name, True, "ok", len(s_rows), len(d_rows))
