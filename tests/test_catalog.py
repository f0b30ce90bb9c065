"""Catalog/namespace surface over a synthesized deterministic files tree
(FIXTURES.md B 'files' schema; operations from SURVEY §2.1-2.5 shell rows)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hadoop_source_spark import catalog


@pytest.fixture(scope="module")
def files(spark):
    rows = []
    base = dt.datetime(2024, 1, 1)
    i = 0
    for top in ("data", "logs"):
        for sub in ("a", "b"):
            for n in range(5):
                path = f"/{top}/{sub}/file{n}.txt"
                rows.append(
                    (path, f"/{top}/{sub}", False, 100 * (i + 1),
                     base + dt.timedelta(hours=i), "alice" if i % 2 else "bob")
                )
                i += 1
    rows.append(("/data/a", "/data", True, 0, base, "root"))
    return spark.createDataFrame(
        rows, "path string, parent string, is_dir boolean, length long, "
              "mtime timestamp, owner string"
    )


def test_glob_to_regex():
    g = catalog.glob_to_regex
    assert g("*.txt") == "^[^/]*\\.txt$"
    assert g("file?.txt") == "^file[^/]\\.txt$"
    assert g("{a,b}.log") == "^(a|b)\\.log$"
    assert g("[0-9]x") == "^[0-9]x$"


def test_glob_to_regex_escapes_negation_nesting():
    """GlobPattern.java corner semantics: \\-escape, [!...] negation,
    glob metacharacters inside {} alternatives."""
    g = catalog.glob_to_regex
    assert g(r"\*.txt") == "^\\*\\.txt$"            # escaped * is literal
    assert g("[!ab]x") == "^[^ab]x$"                # negated class
    assert g("{a*,b?}.log") == "^(a[^/]*|b[^/])\\.log$"  # nested globs
    assert g("{a,{b,c}}") == "^(a|(b|c))$"          # nested braces
    rx = __import__("re").compile(g("{a*,b}"))
    assert rx.match("aXY") and rx.match("b") and not rx.match("c")


def test_glob_filter_iname_case_insensitive(spark, files):
    upper = files.filter(
        catalog.glob_filter("path", "/DATA/*/FILE1.TXT", case_insensitive=True)
    )
    assert upper.count() == 2
    assert files.filter(catalog.glob_filter("path", "/DATA/*")).count() == 0


def test_find_depth_and_prune(spark, files):
    """-maxdepth prunes deep paths; prune (Result.STOP) excludes a
    subtree even when other predicates match."""
    shallow = catalog.find(
        files, max_depth=3, depth_col=F.regexp_replace("path", "^/", "")
    )
    assert all(
        r.path.strip("/").count("/") <= 2 for r in shallow.collect()
    )
    pruned = catalog.find(
        files,
        catalog.glob_filter("path", "/data/*/*"),
        prune=catalog.glob_filter("path", "/data/a/*"),
    )
    paths = [r.path for r in pruned.collect()]
    assert paths and all(not p.startswith("/data/a/") for p in paths)


def test_glob_filter_components_dont_cross_slash(spark, files):
    # '*' must not match across path separators (GlobPattern semantics)
    got = files.filter(catalog.glob_filter("path", "/data/*/file1.txt"))
    assert sorted(r.path for r in got.collect()) == [
        "/data/a/file1.txt", "/data/b/file1.txt",
    ]
    none = files.filter(catalog.glob_filter("path", "/data/*.txt"))
    assert none.count() == 0


def test_find_predicate_tree(spark, files):
    got = catalog.find(
        files,
        catalog.glob_filter("path", "/logs/*/*"),
        F.col("length") > 1200,
        ~F.col("is_dir"),
    )
    assert all(r.path.startswith("/logs/") and r.length > 1200 for r in got.collect())
    assert got.count() > 0


def test_ls_orderings(spark, files):
    by_size = [r.path for r in catalog.ls(files, order="size", reverse=True).collect()]
    sizes = {r.path: r.length for r in files.collect()}
    assert by_size == sorted(sizes, key=lambda p: -sizes[p])
    by_mtime = [r.path for r in catalog.ls(files, order="mtime").collect()]
    mtimes = {r.path: r.mtime for r in files.collect()}
    assert by_mtime == sorted(mtimes, key=lambda p: mtimes[p])


def test_du_rollup(spark, files):
    got = {r.parent: (r.length, r.file_count)
           for r in catalog.du(files.filter(~F.col("is_dir")), "parent").collect()}
    assert set(got) == {"/data/a", "/data/b", "/logs/a", "/logs/b"}
    assert got["/data/a"][1] == 5


def test_stat_format(spark, files):
    one = files.filter(F.col("path") == "/data/a/file0.txt")
    out = catalog.stat_format(
        one, "%n %b %u", {"%n": "path", "%b": "length", "%u": "owner"}
    ).collect()[0].stat
    assert out == "/data/a/file0.txt 100 bob"


def test_files_from_fs_real_tree(spark):
    """du/count over a REAL directory (the testdata tree)."""
    fdf = catalog.files_from_fs(spark, "/root/testdata/sf0.001")
    import os

    real = sum(
        os.path.getsize(os.path.join("/root/testdata/sf0.001", f))
        for f in os.listdir("/root/testdata/sf0.001")
        if os.path.isfile(os.path.join("/root/testdata/sf0.001", f))
    )
    got = (
        fdf.filter(~F.col("is_dir"))
        .filter(F.col("parent") == "/root/testdata/sf0.001")
        .agg(F.sum("length"))
        .collect()[0][0]
    )
    assert got == real
    # glob over the real namespace
    n_parquet = fdf.filter(
        catalog.glob_filter("path", "/root/testdata/sf0.001/*.parquet")
    ).count()
    assert n_parquet == 10


def test_paginate_bounded_pages(spark, files):
    pages = list(catalog.paginate(files, ["path"], page_size=7))
    assert all(len(p) <= 7 for p in pages)
    flat = [r.path for p in pages for r in p]
    assert flat == sorted(flat)
    assert len(flat) == files.count()


def test_test_predicates(spark, files):
    """shell Test.java -d/-e/-f/-s/-z as boolean expressions."""
    exists = files.filter(F.col("path") == "/data/a").count() > 0   # -e
    isdir = files.filter((F.col("path") == "/data/a") & F.col("is_dir")).count() > 0  # -d
    nonzero = files.filter(
        (F.col("path") == "/data/a/file0.txt") & (F.col("length") > 0)
    ).count() > 0  # -s
    assert exists and isdir and nonzero


def test_glob_to_regex_matches_fnmatch_on_simple_patterns():
    """Property: for patterns using only * ? and literals, and paths with
    no '/', glob matching agrees with Python's fnmatch (both implement
    the same single-component glob semantics)."""
    import fnmatch
    import re as _re
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = "abcX.-_"
    pat_st = st.text(alphabet=alphabet + "*?", min_size=0, max_size=8)
    path_st = st.text(alphabet=alphabet, min_size=0, max_size=10)

    @settings(max_examples=300, deadline=None)
    @given(pat_st, path_st)
    def check(pattern, path):
        ours = bool(_re.match(catalog.glob_to_regex(pattern) , path))
        ref = fnmatch.fnmatchcase(path, pattern)
        assert ours == ref, (pattern, path)

    check()
