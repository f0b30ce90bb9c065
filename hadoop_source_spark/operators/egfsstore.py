"""ATS 1.5 EntityGroupFS plugin timeline storage: active/done log-tree
scanning, summary/detail log classification, app-state resolution, and
the retention cleaner.

Reference semantics (`hadoop-yarn-server-timeline-pluginstorage/...
/EntityGroupFSTimelineStore.java`, pinned by
`TestEntityGroupFSTimelineStore.java`):

- ``scanActiveLogs:361-383``: walk the active root; a directory whose
  NAME parses as an ApplicationId is an app-log dir (counted and
  scheduled for parsing — the walk does NOT recurse into it); other
  directories recurse (the per-user layer), plain files are ignored
  with a warning.
- ``AppLogs.scanForLogs:747-797``: inside an app dir, only DIRECT
  child directories named ``appattempt...`` are scanned, and only
  their DIRECT child FILES classify: ``domainlog-*`` → summary store
  (domain), ``summarylog-*`` → summary store (entities),
  ``entitylog-*`` → detail store (entity groups); anything else is
  skipped and does NOT advance the newest-log modification time.
  With no recognized log, the app dir's own mtime stands in (:790-794).
- App state (``getAndSetAppLogs:617-651``): COMPLETED when the app's
  done path exists, ACTIVE when an active path exists (directly or
  under a user dir), else UNKNOWN — and an UNKNOWN app whose newest
  log is older than ``unknown_active_ms`` is assumed COMPLETED
  (``parseSummaryLogs:716-723``).
- Done path layout (``getDoneAppPath:589-596``):
  ``<done>/<clusterTimestamp>/<id div 1e6 %04d>/<(id div 1e3) mod 1e3
  %04d>/<appId>`` — the mod-1000 bucket fan-out.
- Cleaner (``cleanLogs:466-549``): under each NUMERIC
  cluster-timestamp dir, every dir whose name parses as an app id is
  deleted iff EVERY descendant entry's mtime is stale
  (``now - mtime > retain``; an empty app dir deletes); the
  timestamp dir itself is deleted when no app dir exists below it and
  its own mtime is stale.

Spark-first: the trees are rows of a files table; app-dir discovery
and log classification are regexp projections on the path column; the
"no ancestor is an app dir" rule and the all-descendants-stale rule
are two aggregates on a derived app-dir prefix key — no recursion, no
driver-side listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOMAIN_LOG_PREFIX = "domainlog-"
SUMMARY_LOG_PREFIX = "summarylog-"
ENTITY_LOG_PREFIX = "entitylog-"

_APP_RE = r"^application_[0-9]+_[0-9]+$"
_ATTEMPT_PREFIX = "appattempt_"

ACTIVE = "ACTIVE"
COMPLETED = "COMPLETED"
UNKNOWN = "UNKNOWN"


def _seg(col, i):
    return F.element_at(F.split(col, "/"), i)


def discover_app_dirs(listing: DataFrame, root: str) -> DataFrame:
    """App-log dirs under ``root``: directories whose name parses as an
    application id, at depth 1 (``active/<app>``) or depth 2 under a
    user dir (``active/<user>/<app>``) — the only layouts the active
    scanner produces; a dir nested under another app dir is never
    visited (scanActiveLogs does not recurse into app dirs).

    ``listing``: (path string — '/'-separated relative to the tree
    root's parent, is_dir boolean, mtime long). Returns (app_dir,
    app_id)."""
    under = listing.where(
        F.col("is_dir") & F.col("path").startswith(root + "/")
    ).select(
        "path",
        F.expr(f"substring(path, {len(root) + 2})").alias("rel"),
    )
    depth = F.size(F.split("rel", "/"))
    name = _seg(F.col("rel"), -1)
    parent = F.when(depth == 1, F.lit(None)).otherwise(_seg(F.col("rel"), 1))
    is_app = name.rlike(_APP_RE)
    # a user-layer dir that itself looks like an app id would have been
    # scanned as an app dir, not recursed into — so a depth-2 app dir
    # only counts when its parent is NOT app-shaped
    cond = (is_app & (depth == 1)) | (
        is_app & (depth == 2) & ~parent.rlike(_APP_RE)
    )
    return under.where(cond).select(
        F.col("path").alias("app_dir"), name.alias("app_id")
    )


def classify_logs(listing: DataFrame, app_dirs: DataFrame) -> DataFrame:
    """scanForLogs over every discovered app dir at once.

    Returns one row per DIRECT file of a DIRECT ``appattempt...`` child
    dir: (app_dir, app_id, attempt_dir, filename, log_kind ∈
    DOMAIN|SUMMARY|ENTITY|SKIP, store ∈ summary|detail|null, mtime)."""
    files = listing.where(~F.col("is_dir")).select(
        F.col("path"), F.col("mtime")
    )
    j = files.join(
        F.broadcast(app_dirs),
        F.col("path").startswith(F.concat("app_dir", F.lit("/"))),
    )
    rel = F.expr("substring(path, length(app_dir) + 2)")
    parts = F.split(rel, "/")
    attempt = F.element_at(parts, 1)
    fname = F.element_at(parts, 2)
    kind = (
        F.when(fname.startswith(DOMAIN_LOG_PREFIX), "DOMAIN")
        .when(fname.startswith(SUMMARY_LOG_PREFIX), "SUMMARY")
        .when(fname.startswith(ENTITY_LOG_PREFIX), "ENTITY")
        .otherwise("SKIP")
    )
    return (
        j.where(
            (F.size(parts) == 2) & attempt.startswith(_ATTEMPT_PREFIX)
        )
        .select(
            "app_dir",
            "app_id",
            attempt.alias("attempt_dir"),
            fname.alias("filename"),
            kind.alias("log_kind"),
            F.when(kind.isin("DOMAIN", "SUMMARY"), "summary")
            .when(kind == "ENTITY", "detail")
            .alias("store"),
            "mtime",
        )
    )


def app_scan_rollup(
    listing: DataFrame,
    app_dirs: DataFrame,
    now: int,
    unknown_active_ms: int,
    done_app_ids: DataFrame | None = None,
) -> DataFrame:
    """Per-app scan summary + state resolution.

    ``done_app_ids``: (app_id) rows whose done path exists (COMPLETED);
    apps under the active tree are ACTIVE; otherwise UNKNOWN, assumed
    COMPLETED once the newest log is older than ``unknown_active_ms``.
    Returns (app_id, app_dir, n_domain, n_summary, n_entity, n_skipped,
    newest_log_mtime, state)."""
    logs = classify_logs(listing, app_dirs)
    dirs = listing.where(F.col("is_dir")).select(
        F.col("path").alias("app_dir"), F.col("mtime").alias("__dir_mtime")
    )
    agg = logs.groupBy("app_dir", "app_id").agg(
        F.sum(F.when(F.col("log_kind") == "DOMAIN", 1).otherwise(0)).alias(
            "n_domain"
        ),
        F.sum(F.when(F.col("log_kind") == "SUMMARY", 1).otherwise(0)).alias(
            "n_summary"
        ),
        F.sum(F.when(F.col("log_kind") == "ENTITY", 1).otherwise(0)).alias(
            "n_entity"
        ),
        F.sum(F.when(F.col("log_kind") == "SKIP", 1).otherwise(0)).alias(
            "n_skipped"
        ),
        F.max(
            F.when(F.col("log_kind") != "SKIP", F.col("mtime"))
        ).alias("__log_mtime"),
    )
    base = (
        app_dirs.join(agg, ["app_dir", "app_id"], "left")
        .join(dirs, "app_dir", "left")
        .withColumn(
            "newest_log_mtime",
            F.coalesce("__log_mtime", "__dir_mtime"),
        )
    )
    if done_app_ids is not None:
        done = done_app_ids.select(
            F.col("app_id"), F.lit(True).alias("__done")
        )
        base = base.join(F.broadcast(done), "app_id", "left")
    else:
        base = base.withColumn("__done", F.lit(None).cast("boolean"))
    active = F.col("app_dir").rlike("(^|/)active/")
    state = (
        F.when(F.col("__done"), COMPLETED)
        .when(active, ACTIVE)
        .when(
            F.lit(now) - F.col("newest_log_mtime") > unknown_active_ms,
            COMPLETED,
        )
        .otherwise(UNKNOWN)
    )
    zero = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    return base.select(
        "app_id",
        "app_dir",
        zero("n_domain").alias("n_domain"),
        zero("n_summary").alias("n_summary"),
        zero("n_entity").alias("n_entity"),
        zero("n_skipped").alias("n_skipped"),
        F.col("newest_log_mtime").cast("long").alias("newest_log_mtime"),
        state.alias("state"),
    )


def done_app_path(app_id_col, cluster_ts_col, done_root: str):
    """getDoneAppPath:589-596 — ``<done>/<ts>/<id div 1e6>/<(id div
    1e3) mod 1e3>/<appId>`` with %04d buckets. ``app_id_col`` is the
    numeric sequence id column."""
    b1 = F.format_string("%04d", (app_id_col / 1000000).cast("int"))
    b2 = F.format_string(
        "%04d", ((app_id_col / 1000) % 1000).cast("int")
    )
    app = F.concat_ws(
        "_", F.lit("application"), cluster_ts_col.cast("string"),
        app_id_col.cast("string"),
    )
    return F.concat_ws(
        "/", F.lit(done_root), cluster_ts_col.cast("string"), b1, b2, app
    )


def clean_plan(
    listing: DataFrame, done_root: str, now: int, retain_ms: int
) -> DataFrame:
    """Retention decisions over the done tree.

    Returns one row per app-log dir and per cluster-timestamp dir:
    (path, kind ∈ app_dir|ts_dir, newest_mtime, decision ∈
    DELETE|KEEP). App dir: DELETE iff no descendant entry is fresh
    (max descendant mtime stale; empty ⇒ DELETE). Timestamp dir:
    DELETE iff no app dir below AND its own mtime is stale."""
    under = listing.where(F.col("path").startswith(done_root + "/")).select(
        "path", "is_dir", "mtime",
        F.expr(f"substring(path, {len(done_root) + 2})").alias("rel"),
    )
    ts_name = _seg(F.col("rel"), 1)
    app_dirs = under.where(
        F.col("is_dir") & _seg(F.col("rel"), -1).rlike(_APP_RE)
    ).select(
        F.col("path").alias("app_dir"), ts_name.alias("__ts")
    )
    # every entry BELOW an app dir (files and dirs — shouldCleanAppLogDir
    # walks both and any fresh entry keeps the dir)
    desc = under.alias("e").join(
        F.broadcast(app_dirs).alias("a"),
        F.col("e.path").startswith(F.concat("a.app_dir", F.lit("/"))),
    )
    app_fresh = desc.groupBy("app_dir").agg(
        F.max("mtime").alias("newest_mtime")
    )
    stale = F.lit(now) - F.col("newest_mtime") > retain_ms
    app_rows = (
        app_dirs.join(app_fresh, "app_dir", "left")
        .select(
            F.col("app_dir").alias("path"),
            F.lit("app_dir").alias("kind"),
            F.col("__ts"),
            F.col("newest_mtime").cast("long").alias("newest_mtime"),
            F.when(
                F.col("newest_mtime").isNull() | stale, "DELETE"
            ).otherwise("KEEP").alias("decision"),
        )
    )
    ts_dirs = under.where(
        F.col("is_dir")
        & (F.size(F.split("rel", "/")) == 1)
        & ts_name.rlike("^[0-9]+$")
    ).select(
        "path", ts_name.alias("__ts"), F.col("mtime").alias("__own")
    )
    has_app = app_dirs.groupBy("__ts").agg(
        F.count(F.lit(1)).alias("__n_apps")
    )
    ts_rows = (
        ts_dirs.join(F.broadcast(has_app), "__ts", "left")
        .select(
            "path",
            F.lit("ts_dir").alias("kind"),
            F.col("__ts"),
            F.col("__own").cast("long").alias("newest_mtime"),
            F.when(
                F.col("__n_apps").isNull()
                & (F.lit(now) - F.col("__own") > retain_ms),
                "DELETE",
            ).otherwise("KEEP").alias("decision"),
        )
    )
    return app_rows.unionByName(ts_rows).drop("__ts")
