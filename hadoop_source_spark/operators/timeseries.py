"""Time-series resample + gap-fill: the hypertable-rollup / time_bucket
operator family (TimescaleDB's time_bucket_gapfill + locf/interpolate,
public semantics; in the reference world this is the rolling-window
metrics pass of hadoop-common's metrics2 sinks, e.g.
common/metrics2/lib/MutableRollingAverages.java:52 — fixed-width time
buckets with carry-forward over empty windows).

Spark-first shape: the raw stream collapses to (series, bucket)
aggregates FIRST (map-side partial agg — the shuffle carries one row per
observed bucket, never raw events); the dense bucket spine is generated
from each series' own [min, max] span via sequence()+explode (pure
codegen, spine size = buckets, data-independent of event count); one
left equi-join marks gaps; LOCF and linear interpolation are window
functions partitioned BY SERIES (no global sort — parallelism = number
of series, and each partition holds bucket-count rows, bounded and
small, regardless of raw data volume).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_gapfill(
    df: DataFrame,
    ts_col: str,
    series_col: str,
    value_col: str,
    bucket: str = "hour",
    agg: str = "avg",
) -> DataFrame:
    """Bucket `ts_col` to fixed windows per `series_col`, densify each
    series' span, and fill value gaps two ways: LOCF (carry last
    observation forward) and linear interpolation between the bracketing
    observations (trailing gaps fall back to LOCF).

    Returns one row per (series, bucket) with:
      n_events (0 on gaps), value_locf, value_interp, is_gap.
    """
    agg_expr: Column = {
        "avg": F.round(F.avg(value_col), 6),
        "sum": F.round(F.sum(value_col), 6),
        "min": F.round(F.min(value_col), 6),
        "max": F.round(F.max(value_col), 6),
    }[agg]
    observed = (
        df.select(
            F.col(series_col).alias("series"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bkt"),
            F.col(value_col),
        )
        .groupBy("series", "bkt")
        .agg(F.count(F.lit(1)).alias("n_events"), agg_expr.alias("val"))
    )
    spine = (
        observed.groupBy("series")
        .agg(F.min("bkt").alias("mn"), F.max("bkt").alias("mx"))
        .select(
            "series",
            F.explode(
                F.expr(f"sequence(mn, mx, interval 1 {bucket})")
            ).alias("bkt"),
        )
    )
    dense = spine.join(observed, ["series", "bkt"], "left")

    w_prev = (
        Window.partitionBy("series")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("series")
        .orderBy("bkt")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    epoch = F.unix_timestamp("bkt").cast("double")
    prev_val = F.last("val", ignorenulls=True).over(w_prev)
    next_val = F.first("val", ignorenulls=True).over(w_next)
    prev_t = F.last(
        F.when(F.col("val").isNotNull(), epoch), ignorenulls=True
    ).over(w_prev)
    next_t = F.first(
        F.when(F.col("val").isNotNull(), epoch), ignorenulls=True
    ).over(w_next)
    interp = F.when(F.col("val").isNotNull(), F.col("val")).otherwise(
        F.when(
            next_val.isNotNull() & prev_val.isNotNull(),
            prev_val
            + (next_val - prev_val) * (epoch - prev_t) / (next_t - prev_t),
        ).otherwise(F.coalesce(prev_val, next_val))
    )
    return dense.select(
        "series",
        "bkt",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.round(prev_val, 6).alias("value_locf"),
        F.round(interp, 6).alias("value_interp"),
        F.col("val").isNull().cast("int").alias("is_gap"),
    )


def rolling_zscore(
    buckets: DataFrame,
    series_col: str = "series",
    idx_col: str = "idx",
    value_col: str = "val",
    lookback: int = 7,
    min_obs: int = 3,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Rolling-window anomaly scores over per-series bucket aggregates
    (the metrics2 MutableRollingAverages family read as an anomaly
    detector — each bucket scored against the trailing window's
    mean/stddev, the classic ops-dashboard "is today's rate 3 sigma
    off" rule).

    Input is already bucket-aggregated (one row per (series, idx)) so
    the windows are partitioned BY SERIES over bucket-count rows —
    bounded state, parallelism = series population, no global sort.
    The scored row is EXCLUDED from its own window (rows between
    `lookback` preceding and 1 preceding), so a spike can't mask
    itself. z is null until `min_obs` trailing buckets exist and while
    the trailing std is 0; the anomaly flag compares the UNROUNDED z.
    """
    w = (
        Window.partitionBy(series_col)
        .orderBy(idx_col)
        .rowsBetween(-lookback, -1)
    )
    n = F.count(value_col).over(w)
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    z = F.when(
        (n >= min_obs) & std.isNotNull() & (std > 0),
        (F.col(value_col) - mean) / std,
    )
    return (
        buckets.withColumn("win_n", n)
        .withColumn("win_mean", mean)
        .withColumn("win_std", std)
        .withColumn("z", z)
        .withColumn(
            "is_anomaly",
            F.when(z.isNotNull(), F.abs(z) > F.lit(z_threshold)),
        )
    )


def ewma(
    series_col: str = "series",
    idx_col: str = "idx",
    value_col: str = "val",
    alpha: float = 0.3,
    span: int = 10,
) -> Column:
    """Finite-window EWMA column over per-series buckets: the last
    `span` buckets weighted (1-alpha)^distance and normalized by the
    realized weight sum — pandas' ewm(adjust=True) restricted to a
    `span`-row window, which gives the recursion a CLOSED window form:

        ewma_i = sum_j w^(i-j)·x_j / sum_j w^(i-j),  j in [i-span+1, i]

    computed as ONE pair of windowed sums via w^(i-j) = w^i · w^(-j):
    the common w^i factor cancels in the ratio, leaving
    sum(x·w^(-idx)) / sum(w^(-idx)) over the frame — exact in doubles
    while idx·|ln w| stays small (idx is a BUCKET index, bounded by
    the series' bucket count, never by raw row count). Truncation
    error vs the infinite recursion is the (1-alpha)^span tail.
    Returns the column; attach with .withColumn on the same frame the
    z-score pass uses so both share one window exchange.
    """
    w = 1.0 - alpha
    win = (
        Window.partitionBy(series_col)
        .orderBy(idx_col)
        .rowsBetween(-(span - 1), 0)
    )
    inv = F.pow(F.lit(w), -F.col(idx_col).cast("double"))
    num = F.sum(F.col(value_col) * inv).over(win)
    den = F.sum(inv).over(win)
    return num / den


def cusum_detect(
    buckets: DataFrame,
    series_col: str = "series",
    idx_col: str = "idx",
    val_col: str = "val",
    warmup: int = 7,
    k_scale: float = 0.5,
    h_scale: float = 4.0,
) -> DataFrame:
    """CUSUM drift detection per series (Page 1954, public semantics;
    the sequential complement to rolling_zscore — a run of small
    same-direction shifts alarms here long before any single bucket
    is 3 sigma off).

    Baseline mu/sd come from the first `warmup` buckets; slack k =
    k_scale*sd, threshold h = h_scale*sd. Post-warmup fold:
    sp = max(0, sp + x - mu - k), sn = max(0, sn + mu - x - k); alarm
    when either exceeds h, then both reset (classic restart CUSUM).
    Warmup rows emit null scores.

    The fold is inherently sequential PER SERIES but bucket-bounded,
    so it runs as one applyInPandas over (series)-grouped bucket
    aggregates — the same shape every stateful kernel here uses:
    parallelism = series population, state = one group in memory,
    never raw-event-sized."""
    import pandas as pd

    out_schema = (
        f"{series_col} string, {idx_col} int, {val_col} double, "
        "mu double, sd double, sp double, sn double, alarm boolean"
    )

    def fold(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(idx_col).reset_index(drop=True)
        w = pdf[val_col].iloc[:warmup]
        mu = float(w.mean())
        sd = float(w.std(ddof=1)) if len(w) > 1 else 0.0
        kk = k_scale * sd
        h = h_scale * sd
        sp = sn = 0.0
        sps, sns, alarms = [], [], []
        for i, x in enumerate(pdf[val_col]):
            if i < warmup:
                sps.append(None)
                sns.append(None)
                alarms.append(None)
                continue
            sp_raw = max(0.0, sp + (x - mu - kk))
            sn_raw = max(0.0, sn + (mu - x - kk))
            alarm = sp_raw > h or sn_raw > h
            sps.append(sp_raw)
            sns.append(sn_raw)
            alarms.append(alarm)
            sp, sn = (0.0, 0.0) if alarm else (sp_raw, sn_raw)
        return pd.DataFrame(
            {
                series_col: pdf[series_col],
                idx_col: pdf[idx_col],
                val_col: pdf[val_col],
                "mu": mu,
                "sd": sd,
                "sp": sps,
                "sn": sns,
                "alarm": alarms,
            }
        )

    fold.__annotations__ = {}
    return buckets.groupBy(series_col).applyInPandas(fold, out_schema)
