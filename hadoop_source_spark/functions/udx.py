"""User-defined function surface beyond scalar pandas_udf: a true Python
UDTF (table function) and a grouped-agg pandas UDAF — completing the
UDF/UDAF/UDTF triad of SURVEY §2.9 (the reference's analog being the
pluggable Writable/serializer surface plus streaming's mapper/reducer
contract).

These are capability demonstrations with tests, NOT used in registered
queries: the engine's hot paths stay JVM-side by design (the global plan
invariant asserts no Python eval node in any driver query), and
everything these two do is expressible with built-ins (from_json +
explode; exp(avg(ln))). They exist so a user porting a custom operator
has a worked, tested example of each extension point.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


@udtf(returnType="key string, value string")
class ParseProps:
    """UDTF: explode a JSON-object string column into (key, value) rows
    — one lateral row per property, skipping null/empty payloads (the
    eval-yield contract; SQL: ``SELECT p.* FROM t, LATERAL
    parse_props(props) p``)."""

    def eval(self, props: str):  # noqa: D102
        if not props:
            return
        try:
            obj = json.loads(props)
        except (ValueError, TypeError):
            return
        if isinstance(obj, dict):
            for k, v in obj.items():
                yield str(k), json.dumps(v) if isinstance(
                    v, (dict, list)
                ) else str(v)


def register_udtfs(spark) -> None:
    """Register the UDTF surface on a session (idempotent)."""
    spark.udtf.register("parse_props", ParseProps)


@pandas_udf("double")
def geo_mean(v: pd.Series) -> float:
    """Grouped-agg pandas UDAF: geometric mean of the positive values in
    the group (Arrow-batched; use as ``df.groupBy(k).agg(geo_mean(col))``).
    Equivalent SQL: exp(avg(ln(x)) FILTER (x > 0)) — the test pins that."""
    import numpy as np

    pos = v[v > 0]
    if len(pos) == 0:
        return float("nan")
    return float(np.exp(np.log(pos.astype("float64")).mean()))
