"""metrics2 RollingFileSystemSink as a time-series source: the sink's
line format and rolled-directory layout, both directions.

Reference semantics (`hadoop-common/.../metrics2/sink/
RollingFileSystemSink.java`, pinned by
`TestRollingFileSystemSink.java` / `RollingFileSystemSinkTestBase`):

- Line format (``putMetrics:823-845``):
  ``<timestamp> <context>.<record>: name=value, name=value, ...`` —
  tags first then metrics, ``": "`` after the header, ``", "``
  separators (the text does not distinguish tag from metric).
- Layout: ``<base>/<yyyyMMddHHmm GMT>/<source>-<hostname>.log``
  (:663); the directory is the roll-interval bucket — interval
  boundaries floor to multiples of the interval
  (``setInitialFlushTime:620-646``, ``findCurrentDirectory:545-557``).
- Roll-interval spec (``getRollInterval:342-390``): ``<int><unit>``
  with unit ∈ m|min|minute(s) / h|hr|hour(s) / d|day(s); a bare
  number means hours; zero/negative is an error.

Spark-first: formatting and parsing are pure string projections
(regexp_extract_all for the kv tail → map); the per-bucket rollup is
one partial-agg groupBy. At 100 TB the .log trees read as a plain
text source partitioned by the bucket directory — predicate pushdown
on the dir name prunes time ranges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_UNITS_MS = {
    "": 3600_000,
    "m": 60_000, "min": 60_000, "minute": 60_000, "minutes": 60_000,
    "h": 3600_000, "hr": 3600_000, "hour": 3600_000, "hours": 3600_000,
    "d": 86400_000, "day": 86400_000, "days": 86400_000,
}


def roll_interval_ms(spec: str) -> int:
    """getRollInterval:342-390 — parse '<int>[unit]' (default hours);
    unknown units and non-positive results raise, as the reference
    throws MetricsException."""
    import re

    m = re.match(r"^\s*(\d+)\s*([A-Za-z]*)\s*$", spec)
    if not m:
        raise ValueError(f"Unrecognized flush interval: {spec!r}")
    unit = m.group(2).lower()
    if unit not in _UNITS_MS:
        raise ValueError(f"Unrecognized unit for flush interval: {spec!r}")
    millis = int(m.group(1)) * _UNITS_MS[unit]
    if millis <= 0:
        raise ValueError(f"Roll interval must be positive: {spec!r}")
    return millis


def bucket_dir(ts_ms: Column, interval_ms: int) -> Column:
    """The roll directory for an event timestamp: epoch floored to the
    interval, formatted yyyyMMddHHmm in GMT (DATE_FORMAT:164-165)."""
    floored = (ts_ms / interval_ms).cast("long") * interval_ms
    return F.date_format(
        F.to_utc_timestamp(
            F.timestamp_millis(floored), "UTC"
        ),
        "yyyyMMddHHmm",
    )


def format_metrics_lines(records: DataFrame) -> DataFrame:
    """putMetrics line per record. ``records``: (ts long ms, context,
    record, kvs map<string,string> — tags-then-metrics ordering is the
    caller's map order; Spark map_entries preserves insertion order for
    map_from_entries inputs). Returns (ts, line)."""
    kv = F.array_join(
        F.transform(
            F.map_entries("kvs"),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]),
        ),
        ", ",
    )
    line = F.concat(
        F.col("ts").cast("string"), F.lit(" "),
        F.col("context"), F.lit("."), F.col("record"),
        F.when(kv == "", F.lit("")).otherwise(F.concat(F.lit(": "), kv)),
    )
    return records.select("ts", line.alias("line"))


def parse_metrics_lines(lines: DataFrame) -> DataFrame:
    """Parse sink lines back to (ts, context, record, kvs map). The
    header splits on the FIRST ': '; the kv tail splits on ', ' then
    '=' (values may not contain ', ' — the sink writes raw
    toString()s, same caveat as the reference's own format)."""
    line = F.col("line")
    header = F.substring_index(line, ": ", 1)
    ts = F.split(header, " ").getItem(0).cast("long")
    cr = F.split(header, " ").getItem(1)
    has_kv = line.contains(": ")
    tail = F.when(
        has_kv, F.expr("substring(line, instr(line, ': ') + 2)")
    )
    kvs = F.when(tail.isNotNull(), F.map_from_entries(
        F.transform(
            F.split(tail, ", "),
            # split on the FIRST '=' — metric toString()s may contain
            # '=' in the value, never in the name
            lambda p: F.struct(
                F.substring_index(p, "=", 1).alias("key"),
                F.substring(
                    p,
                    F.length(F.substring_index(p, "=", 1)) + 2,
                    F.lit(1 << 30),
                ).alias("value"),
            ),
        )
    )).otherwise(F.expr("map()").cast("map<string,string>"))
    return lines.select(
        ts.alias("ts"),
        F.substring_index(cr, ".", 1).alias("context"),
        F.substring_index(cr, ".", -1).alias("record"),
        kvs.alias("kvs"),
    )


def metrics_rollup(
    parsed: DataFrame, interval_ms: int
) -> DataFrame:
    """Per (bucket, context, record, metric) numeric rollup — the
    dashboard-feeding aggregate over a rolled metrics tree. Non-numeric
    values (tags) are skipped.

    explode_outer, not explode: a plain explode makes the optimizer
    infer `size(kvs) > 0` and push it below the parse/format
    projections, re-deriving the whole line round trip from the raw
    columns a second time per input row (measured 4x the query's cost).
    The outer variant emits one null entry for an empty/null map, which
    the numeric filter below drops — identical output, no inferred
    filter."""
    ex = parsed.select(
        bucket_dir(F.col("ts"), interval_ms).alias("bucket"),
        "context", "record",
        F.explode_outer("kvs").alias("name", "value"),
    ).withColumn(
        # try_cast: tag values ('host3') must skip, not throw — the
        # driver's session may run ANSI mode where plain cast errors
        "num", F.col("value").try_cast("double")
    ).where(F.col("num").isNotNull())
    return ex.groupBy("bucket", "context", "record", "name").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("num"), 6).alias("sum"),
        F.round(F.avg("num"), 6).alias("avg"),
        F.min("num").alias("min"),
        F.max("num").alias("max"),
    )
