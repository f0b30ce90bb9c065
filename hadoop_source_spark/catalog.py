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


def glob_to_regex(pattern: str) -> str:
    """Translate an fs glob (* ? [] {}) to an anchored Java/RE2 regex —
    the semantics of common/fs/GlobPattern.java:32."""
    out, i = [], 0
    while i < len(pattern):
        c = pattern[i]
        if c == "*":
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "{":
            j = pattern.index("}", i)
            alts = pattern[i + 1 : j].split(",")
            out.append("(" + "|".join(re.escape(a) for a in alts) + ")")
            i = j
        elif c == "[":
            j = pattern.index("]", i + 1)
            out.append(pattern[i : j + 1])
            i = j
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"


def glob_filter(path_col: Column | str, pattern: str) -> Column:
    """Globber.glob as a pushdown-friendly predicate."""
    return F.col(path_col).rlike(glob_to_regex(pattern)) if isinstance(path_col, str) else path_col.rlike(glob_to_regex(pattern))


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


def find(
    df: DataFrame,
    *predicates: Column,
) -> DataFrame:
    """find-style composable predicate tree: AND of the given expressions
    (shell/find/And.java:58 short-circuits; Catalyst's And does too)."""
    out = df
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
