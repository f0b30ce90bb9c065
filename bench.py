#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Timing = full query execution to a count-style sink (collect for small
results) after a shared-session warmup; parquet scans are re-read per query
(no caching) so scan cost is included, as it would be on a cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_source_spark import get_spark  # noqa: E402
from hadoop_source_spark import workload  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="hss-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up whole-stage-codegen for every headline plan shape at the
    # smallest SF (codegen is keyed by plan, not data size): the timed
    # runs below then measure steady-state throughput, as on a long-lived
    # cluster, not first-query JIT cost.
    warm_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for _name, _fn in workload.headline_queries().items():
        try:
            _fn(spark, warm_dir).count()
        except Exception as exc:  # warmup must never fail the bench
            print(f"# warmup {_name}: {exc}", file=sys.stderr)

    timings: dict[str, float | None] = {}
    spreads: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in workload.headline_queries().items():
        reps: list[float] = []
        n = 0
        # min-of-3 with spread: steady-state, not scheduler noise; a broken
        # query records null + its error and never kills the whole run.
        for _rep in range(3):
            try:
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                n = df.count()
                reps.append(time.perf_counter() - t0)
            except Exception as exc:
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
                break
        if reps:
            timings[name] = round(min(reps), 3)
            spreads[name] = round(max(reps) - min(reps), 3)
            print(
                f"# {name}: {timings[name]:.3f}s (+{spreads[name]:.3f}s spread, {n} rows)",
                file=sys.stderr,
            )
        else:
            timings[name] = None

    total = round(sum(t for t in timings.values() if t is not None), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spreads,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
