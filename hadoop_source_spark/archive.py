"""Hadoop Archive (HAR) analog — pack many small files into one indexed
container with transparent read.

Reference semantics: a .har is an immutable archive of small files plus an
index (_index/_masterindex) that lets HarFileSystem (common/fs/
HarFileSystem.java:55) expose the members as a read-only filesystem —
solving the NameNode small-files problem without unpacking.

Spark-first design: the container is a path-sorted parquet table
(path, parent, length, mtime, content) — the small-files problem is
solved the same way (N tiny files become a handful of splittable parquet
parts), and the parquet row-group min/max stats over the sorted `path`
column ARE the _index: a member lookup or subtree listing prunes to the
row groups whose [min,max] path range can match, exactly like
HarFileSystem's index binary search. At 100 TB an archive reads with
ordinary scan parallelism, and member predicates push down.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_source_spark.catalog import glob_filter


def har_create(spark: SparkSession, src_dir: str, archive_path: str,
               num_parts: int | None = None) -> None:
    """`hadoop archive` analog: pack every file under src_dir (driver-side
    walk — archive creation inputs are small files by definition; a
    distributed packer would use spark.read.format('binaryFile'))."""
    rows = []
    root = os.path.abspath(src_dir)
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in filenames:
            p = os.path.join(dirpath, name)
            rel = os.path.relpath(p, root)
            st = os.stat(p)
            with open(p, "rb") as fh:
                content = fh.read()
            rows.append(
                (rel, os.path.dirname(rel), st.st_size,
                 int(st.st_mtime * 1000), bytearray(content))
            )
    df = spark.createDataFrame(
        rows,
        "path string, parent string, length long, mtime_ms long, "
        "content binary",
    )
    parted = (
        df.repartitionByRange(num_parts, "path")
        if num_parts
        else df.repartitionByRange("path")
    )
    # path-sorted ⇒ row-group stats on `path` are the _index
    parted.sortWithinPartitions("path").write.mode("overwrite").parquet(
        archive_path
    )


def har_open(spark: SparkSession, archive_path: str) -> DataFrame:
    """Mount the archive (HarFileSystem.initialize analog): a DataFrame of
    members; all listing/lookup operators below are plain pushdown-friendly
    filters over it."""
    return spark.read.parquet(archive_path)


def har_ls(har: DataFrame, parent: str = "") -> DataFrame:
    """List one directory level (HarFileSystem.listStatus)."""
    return har.filter(F.col("parent") == parent).select(
        "path", "length", "mtime_ms"
    )


def har_glob(har: DataFrame, pattern: str) -> DataFrame:
    """Member glob over archive paths (Globber over HarFileSystem)."""
    return har.filter(glob_filter("path", pattern))


def har_cat(har: DataFrame, member: str) -> bytes | None:
    """Read one member's bytes (HarFileSystem.open): a point lookup that
    prunes via the sorted-path row-group stats."""
    row = har.filter(F.col("path") == member).select("content").first()
    return None if row is None else bytes(row["content"])


def har_text_lines(har: DataFrame, pattern: str = "*") -> DataFrame:
    """Expose matching text members as (path, line) rows — the
    'archived corpus as input' read path, fully distributed."""
    return (
        har_glob(har, pattern)
        .select(
            "path",
            F.explode(
                F.split(F.decode("content", "UTF-8"), "\n", -1)
            ).alias("line"),
        )
    )
