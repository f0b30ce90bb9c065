"""HDFS audit-log lines: format, parse back, and roll up.

Reference semantics: every namespace op emits one tab-separated audit
line (`hdfs/server/namenode/FSNamesystem.java:8450-8480`
DefaultAuditLogger):

    allowed=<bool>\tugi=<user> (auth:…)\tip=/<addr>\tcmd=<op>\t
    src=<path>\tdst=<path|null>\tperm=<owner:group:mode|null>\tproto=rpc

and ops tooling (`TopAuditLogger.java:79-83`, external log pipelines)
parses those lines back into per-user / per-op activity tables. Both
directions are pure string expressions here — format is one `concat`
projection, parse is a chain of `regexp_extract` field pulls — all
whole-stage codegen, no Python, one scan; the rollup is a single
partial-agg groupBy. At 100 TB of audit text nothing shuffles until the
(user × cmd)-sized aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# event_type → namespace op, the same spirit as streaming/events.py's
# inotify class mapping (one op per fixture event type).
_CMD = {
    "signup": "mkdirs",
    "view": "open",
    "click": "listStatus",
    "purchase": "create",
    "error": "delete",
}


def _cmd_expr() -> Column:
    expr = F.lit(None).cast("string")
    for etype, cmd in _CMD.items():
        expr = F.when(F.col("event_type") == etype, F.lit(cmd)).otherwise(expr)
    return expr


def format_audit_lines(events: DataFrame, user_mod: int = 40) -> DataFrame:
    """One audit line per event, in the DefaultAuditLogger layout with
    the log4j `date,millis level logger:` prefix real audit files carry.
    `allowed=false` for delete attempts (the denied-op branch the
    reference logs identically); perm is populated only on namespace
    creation (create/mkdirs), null otherwise, as FileStatus is."""
    uid = F.col("user_id") % user_mod
    cmd = _cmd_expr()
    allowed = F.when(F.col("event_type") == "error", F.lit("false")).otherwise(
        F.lit("true")
    )
    perm = F.when(
        cmd.isin("create", "mkdirs"),
        F.concat(F.lit("user_"), uid.cast("string"), F.lit(":supergroup:rwxr-xr-x")),
    ).otherwise(F.lit("null"))
    line = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss,SSS"),
        F.lit(" INFO FSNamesystem.audit: allowed="), allowed,
        F.lit("\tugi=user_"), uid.cast("string"), F.lit(" (auth:SIMPLE)"),
        F.lit("\tip=/10.0."), (F.col("user_id") % 200).cast("string"),
        F.lit("."), (F.col("event_id") % 250).cast("string"),
        F.lit("\tcmd="), cmd,
        F.lit("\tsrc=/data/u"), F.col("user_id").cast("string"),
        F.lit("/f"), F.col("event_id").cast("string"),
        F.lit("\tdst=null\tperm="), perm,
        F.lit("\tproto=rpc"),
    )
    return events.select(*events.columns, line.alias("line"))


def parse_audit_lines(
    lines: DataFrame, col: str = "line", carry: tuple[str, ...] = ()
) -> DataFrame:
    """Field extraction back out of raw audit text — the parse direction
    ops pipelines run. Tab-delimited `key=value` pulls; the timestamp
    prefix stays a string (its format is lexicographically ordered).
    `carry` passes companion columns (e.g. the event-time `ts` a
    streaming rollup watermarks on) through untouched."""
    c = F.col(col)
    field = lambda k: F.regexp_extract(c, rf"{k}=([^\t]*)", 1)  # noqa: E731
    return lines.select(
        *carry,
        F.regexp_extract(c, r"^(\S+ \S+)", 1).alias("log_ts"),
        field("allowed").alias("allowed"),
        F.regexp_extract(c, r"ugi=(\S+)", 1).alias("ugi"),
        field("ip").alias("ip"),
        field("cmd").alias("cmd"),
        field("src").alias("src"),
        field("dst").alias("dst"),
        field("perm").alias("perm"),
        F.regexp_extract(c, r"src=/data/(u[0-9]+)/", 1).alias("src_dir"),
    )


def audit_summary(parsed: DataFrame) -> DataFrame:
    """Per-(ugi, cmd) activity rollup: op counts, allow/deny split,
    distinct source directories touched, first/last line timestamp.
    The `nnTopUserOpCounts` analog (TopAuditLogger feeds the NameNode
    top-users metric from exactly these lines)."""
    return parsed.groupBy("ugi", "cmd").agg(
        F.count(F.lit(1)).alias("n_ops"),
        F.count(F.when(F.col("allowed") == "true", 1)).alias("n_allowed"),
        F.count(F.when(F.col("allowed") == "false", 1)).alias("n_denied"),
        F.countDistinct("src_dir").alias("n_src_dirs"),
        F.min("log_ts").alias("first_ts"),
        F.max("log_ts").alias("last_ts"),
    )


def audit_rates_stream(parsed: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming per-(hour, ugi, cmd) audit rates over a live audit
    stream — the tail-the-audit-log ops dashboard. `parsed` must carry
    the event-time `ts` column (parse_audit_lines carry=("ts",)).

    State-bounding depends on the OUTPUT MODE the caller runs this
    with: in update/append mode Spark evicts window state older than
    the watermark (bounded state, late lines beyond `watermark`
    dropped — test_streaming.py pins the across-restart drop); in
    complete mode (the driver's batch-equivalence row) Spark RETAINS
    every window ever seen and the watermark is declarative only —
    fine for a bounded replay, not for an unbounded tail."""
    return (
        parsed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "ugi", "cmd")
        .agg(
            F.count(F.lit(1)).alias("n_ops"),
            F.count(F.when(F.col("allowed") == "false", 1)).alias("n_denied"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "ugi", "cmd", "n_ops", "n_denied",
        )
    )
