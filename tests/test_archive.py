"""HAR archive analog (common/fs/HarFileSystem.java:55): pack, mount,
list, glob, point-read, distributed text read — with the sorted-path
row-group stats acting as the _index (pushdown asserted)."""

from __future__ import annotations

import os
import tempfile

import pytest

from hadoop_source_spark import archive as har


@pytest.fixture(scope="module")
def archived(spark):
    src = tempfile.mkdtemp(prefix="har_src_")
    os.makedirs(f"{src}/logs", exist_ok=True)
    for i in range(50):
        with open(f"{src}/doc{i:02d}.txt", "w") as f:
            f.write(f"alpha {i}\nbeta {i}")
    for i in range(10):
        with open(f"{src}/logs/app{i}.log", "w") as f:
            f.write(f"log line {i}")
    out = tempfile.mkdtemp(prefix="har_out_") + "/corpus.har"
    har.har_create(spark, src, out, num_parts=4)
    return har.har_open(spark, out)


def test_har_ls_and_glob(spark, archived):
    top = {r.path for r in har.har_ls(archived).collect()}
    assert top == {f"doc{i:02d}.txt" for i in range(50)}
    logs = {r.path for r in har.har_ls(archived, "logs").collect()}
    assert logs == {f"logs/app{i}.log" for i in range(10)}
    assert har.har_glob(archived, "doc1?.txt").count() == 10


def test_har_cat_point_lookup_pushes_down(spark, archived):
    assert har.har_cat(archived, "doc07.txt") == b"alpha 7\nbeta 7"
    assert har.har_cat(archived, "missing") is None
    from pyspark.sql import functions as F

    plan = (
        archived.filter(F.col("path") == "doc07.txt")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(path), EqualTo(path,doc07.txt)" in plan


def test_har_text_lines_distributed_read(spark, archived):
    lines = har.har_text_lines(archived, "doc*.txt")
    assert lines.count() == 100
    got = {
        (r.path, r.line)
        for r in lines.filter(lines.line.startswith("beta")).collect()
    }
    assert got == {(f"doc{i:02d}.txt", f"beta {i}") for i in range(50)}
