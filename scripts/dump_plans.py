#!/usr/bin/env python
"""Dump .explain('formatted') for headline queries to plans/r14/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py <tag> [query ...]
Plans only — no jobs are executed (except unavoidable eager steps inside
query construction, e.g. eager localCheckpoints; those run at sf0.01 to
keep this cheap)."""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_source_spark import get_spark, workload


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="hss-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = workload.headline_queries()
    if names:
        qs = {n: workload.QUERIES[n].fn for n in names}
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:
            text = f"PLAN FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({tag})\n")
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
