# No `from __future__ import annotations` here: pandas_udf infers the UDF
# kind from REAL type hints, and stringified annotations break inference.
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def py_quality(text: pd.Series) -> pd.Series:
    n_tokens = text.str.split().map(len)
    return (n_tokens / 100.0).clip(upper=1.0)
