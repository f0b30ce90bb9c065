"""Namespace / metadata queries — the FsShell surface as DataFrame ops.

The reference queries its file-tree metadata with a shell command pipeline
(common/fs/FsShell.java:301 → shell/Command.java:169): glob expansion
(common/fs/Globber.java:197), find predicate trees
(common/fs/shell/find/Find.java:43), ls orderings (shell/Ls.java:374),
du/count rollups (shell/FsUsage.java:220, shell/Count.java:196), stat
projections (shell/Stat.java:32-42). Here the namespace is any DataFrame
with a path-like column and the whole pipeline is Catalyst: glob → rlike
filter, find → boolean expression tree, count/du → groupBy/agg.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _glob_body(pattern: str) -> str:
    """Recursive glob→regex translation (GlobPattern.java:32 semantics):
    ``\\x`` escapes x literally, ``[!...]`` negates a class, ``{a,b}``
    alternatives are themselves glob-translated (nested globs work)."""
    out, i, n = [], 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            out.append(re.escape(pattern[i + 1]))
            i += 1
        elif c == "*":
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "{":
            # matching close brace, honoring nesting and escapes
            depth, j = 1, i + 1
            alts, start = [], i + 1
            while j < n and depth > 0:
                if pattern[j] == "\\":
                    j += 1
                elif pattern[j] == "{":
                    depth += 1
                elif pattern[j] == "}":
                    depth -= 1
                    if depth == 0:
                        break
                elif pattern[j] == "," and depth == 1:
                    alts.append(pattern[start:j])
                    start = j + 1
                j += 1
            if j >= n:  # unbalanced: literal brace, as GlobPattern errors->literal
                out.append(re.escape(c))
            else:
                alts.append(pattern[start:j])
                out.append("(" + "|".join(_glob_body(a) for a in alts) + ")")
                i = j
        elif c == "[":
            j = i + 1
            if j < n and pattern[j] == "!":
                j += 1
            if j < n and pattern[j] == "]":  # ']' first is literal
                j += 1
            while j < n and pattern[j] != "]":
                j += 1
            if j >= n:
                out.append(re.escape(c))
            else:
                body = pattern[i + 1 : j]
                if body.startswith("!"):
                    body = "^" + body[1:]
                out.append("[" + body + "]")
                i = j
        else:
            out.append(re.escape(c))
        i += 1
    return "".join(out)


def glob_to_regex(pattern: str) -> str:
    """Anchored regex for an fs glob (* ? [] [!] {} \\-escape) —
    common/fs/GlobPattern.java:32."""
    return "^" + _glob_body(pattern) + "$"


def glob_filter(
    path_col: Column | str, pattern: str, case_insensitive: bool = False
) -> Column:
    """Globber.glob as a pushdown-friendly predicate; case_insensitive
    gives find's ``-iname`` (shell/find/Name.java:29)."""
    rx = glob_to_regex(pattern)
    if case_insensitive:
        rx = "(?i)" + rx
    c = F.col(path_col) if isinstance(path_col, str) else path_col
    return c.rlike(rx)


def files_from_fs(spark, root: str) -> DataFrame:
    """Materialize a real directory tree as the `files` metadata table
    (FileStatus model: FileSystem.java:181). Driver-side walk — namespace
    metadata is small by definition; for a distributed listing use the
    InMemoryFileIndex via spark.read, which parallelizes automatically."""
    import os
    import datetime as dt

    rows = []
    for dirpath, dirnames, filenames in os.walk(root):
        for d in dirnames:
            p = os.path.join(dirpath, d)
            st = os.stat(p)
            rows.append((p, dirpath, True, 0,
                         dt.datetime.utcfromtimestamp(st.st_mtime)))
        for f in filenames:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            rows.append((p, dirpath, False, st.st_size,
                         dt.datetime.utcfromtimestamp(st.st_mtime)))
    return spark.createDataFrame(
        rows,
        "path string, parent string, is_dir boolean, length long, mtime timestamp",
    )


def paginate(df: DataFrame, order: list[str], page_size: int):
    """Paginated listing (FSDirStatAndListingOp.java:213, dfs.ls.limit):
    yields the ordered result in bounded pages without materializing the
    whole listing on the driver."""
    it = df.orderBy(*order).toLocalIterator()
    page = []
    for row in it:
        page.append(row)
        if len(page) == page_size:
            yield page
            page = []
    if page:
        yield page


def path_depth(path_col: Column | str) -> Column:
    """Number of path components ('a/b/c' → 3)."""
    c = F.col(path_col) if isinstance(path_col, str) else path_col
    return F.size(F.split(c, "/", -1))


def find(
    df: DataFrame,
    *predicates: Column,
    prune: Column | None = None,
    max_depth: int | None = None,
    min_depth: int | None = None,
    depth_col: str | Column | None = None,
) -> DataFrame:
    """find-style composable predicate tree (shell/find/Find.java:102,
    find/Result.java):

    - predicates AND together (And.java:58 short-circuits; Catalyst's And
      does too — PASS/FAIL).
    - ``prune`` is the Result.STOP analog: rows in a pruned subtree are
      excluded before any other predicate runs, the way -prune stops
      descent (here: a predicate over the path, evaluated in the same
      scan — still one pass, still pushdown-friendly).
    - ``min_depth``/``max_depth`` are -mindepth/-maxdepth over the
      component count of ``depth_col``.
    """
    out = df
    if prune is not None:
        out = out.filter(~prune)
    if max_depth is not None or min_depth is not None:
        if depth_col is None:
            raise ValueError("depth bounds need depth_col")
        d = path_depth(depth_col)
        if max_depth is not None:
            out = out.filter(d <= max_depth)
        if min_depth is not None:
            out = out.filter(d >= min_depth)
    for p in predicates:
        out = out.filter(p)
    return out


def ls(
    df: DataFrame,
    order: str = "path",
    reverse: bool = False,
    path_col: str = "path",
) -> DataFrame:
    """Ls orderings: name (default), mtime (-t), size (-S), reversed (-r)."""
    col_map = {"path": path_col, "mtime": "mtime", "size": "length"}
    c = F.col(col_map.get(order, order))
    return df.orderBy(c.desc() if reverse else c.asc())


def du(df: DataFrame, group_col: str, size_col: str = "length") -> DataFrame:
    """Per-group space usage (FsUsage.Du)."""
    return df.groupBy(group_col).agg(
        F.sum(size_col).alias("length"),
        F.count(F.lit(1)).alias("file_count"),
    )


def stat_format(df: DataFrame, fmt: str, mapping: dict[str, str]) -> DataFrame:
    """Stat '%'-format projection (shell/Stat.java:36-42): e.g.
    fmt='%n %b', mapping={'%n': 'path', '%b': 'length'}."""
    pieces: list[Column] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt) and "%" + fmt[i + 1] in mapping:
            pieces.append(F.col(mapping["%" + fmt[i + 1]]).cast("string"))
            i += 2
        else:
            j = i
            while j < len(fmt) and fmt[j] != "%":
                j += 1
            pieces.append(F.lit(fmt[i:j]))
            i = j
    return df.select(F.concat(*pieces).alias("stat"))


def file_distribution(
    inodes: DataFrame,
    max_size: int,
    step: int,
    type_col: str = "inode_type",
    size_col: str = "size",
    repl_col: str = "replication",
    blocks_col: str = "blocks",
) -> DataFrame:
    """OIV FileDistribution (hdfs offline image viewer
    `FileDistributionCalculator.java:62,118`): the namespace image's
    file-size histogram over segments of `step` up to `max_size`, plus
    the totals the tool prints.

    Bucketing is the reference's exact rule (:137-141): bucket =
    ceil(size / step) — so segment i counts sizes in ((i-1)·step,
    i·step], size 0 in bucket 0 — files larger than max_size land in
    the LAST bucket, and the index clamps there too when step does not
    divide max_size evenly. Zero-count buckets are skipped, as
    output() does (:157).

    inodes: (inode_type 'FILE'|'DIRECTORY', size, replication,
    blocks). Output rows: (stat, size, value) — stat='bucket' rows
    carry the segment label size = i·step (:166, the segment's upper
    bound as printed) and value = NumFiles; five totals rows
    (totalFiles, totalDirectories, totalBlocks, totalSpace =
    Σ size·replication, maxFileSize — :172-176) carry size NULL.
    One scan: a groupBy for the histogram, a partial-agg reduce +
    melt for the totals."""
    last = max_size // step
    is_file = F.col(type_col) == "FILE"
    files = inodes.filter(is_file)
    bucket = F.least(
        F.when(F.col(size_col) > max_size, F.lit(last)).otherwise(
            F.ceil(F.col(size_col) / F.lit(step))
        ),
        F.lit(last),
    )
    hist = (
        files.groupBy(bucket.alias("__b"))
        .agg(F.count(F.lit(1)).alias("value"))
        .select(
            F.lit("bucket").alias("stat"),
            (F.col("__b") * step).cast("long").alias("size"),
            F.col("value").cast("long"),
        )
    )
    t = inodes.agg(
        F.count(F.when(is_file, 1)).alias("totalFiles"),
        F.count(F.when(F.col(type_col) == "DIRECTORY", 1)).alias(
            "totalDirectories"
        ),
        F.sum(F.when(is_file, F.col(blocks_col))).alias("totalBlocks"),
        F.sum(
            F.when(is_file, F.col(size_col) * F.col(repl_col))
        ).alias("totalSpace"),
        F.max(F.when(is_file, F.col(size_col))).alias("maxFileSize"),
    )
    totals = t.selectExpr(
        "stack(5, 'totalFiles', totalFiles, "
        "'totalDirectories', totalDirectories, "
        "'totalBlocks', totalBlocks, 'totalSpace', totalSpace, "
        "'maxFileSize', maxFileSize) AS (stat, value)"
    ).select(
        "stat",
        F.lit(None).cast("long").alias("size"),
        F.col("value").cast("long"),
    )
    return hist.unionByName(totals)
