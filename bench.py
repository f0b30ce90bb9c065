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
    try:
        out["control_plane"] = control_plane_open_bench(spark)
    except Exception as exc:  # auxiliary metric must never fail the bench
        print(f"# control_plane: FAILED {exc}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


def control_plane_open_bench(spark, n_files: int = 100_000, n_ops: int = 100_000):
    """Analog of the reference's only published number: NNThroughputBenchmark
    `open` (BASELINE.md: 10,515 ops/s resolving 100,000 paths with 1000
    threads). Here the namespace is a cached metadata DataFrame and the
    100,000 opens are resolved as ONE batched hash join — the engine-native
    way to do metadata ops at scale (a driver-side loop of 100k jobs would
    measure the scheduler, not the catalog). The create phase (namespace
    build) is untimed, matching the benchmark's -op open which times only
    the opens against a pre-created namespace."""
    from pyspark.sql import functions as F

    def path_expr(file_id):
        return F.concat_ws(
            "/",
            F.lit("/ThroughputBenchDir"),
            (file_id % 250).cast("string"),
            F.concat(F.lit("f"), file_id.cast("string")),
        )

    cat = (
        spark.range(n_files)
        .select(
            path_expr(F.col("id")).alias("path"),
            (F.col("id") * 137 % 10_000_000).alias("length"),
            (F.col("id") % 3 + 1).alias("repl"),
            (F.col("id") % 64).alias("block_id"),
        )
        .repartition(32, "path")
        .cache()
    )
    cat.count()  # untimed create phase
    t0 = time.perf_counter()
    # deterministic pseudo-random access order (48271 coprime to n_files)
    req = spark.range(n_ops).select(
        path_expr(F.col("id") * 48271 % n_files).alias("path")
    )
    row = (
        req.join(cat, "path")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("length").alias("bytes"))
        .collect()[0]
    )
    wall = time.perf_counter() - t0
    cat.unpersist()
    assert row.n == n_ops, f"unresolved opens: {n_ops - row.n}"
    return {
        "metric": "open_ops_per_sec",
        "value": round(n_ops / wall, 1),
        "ops": n_ops,
        "wall_sec": round(wall, 3),
        "baseline_ref_ops_per_sec": 10515.25,
        "note": "batched metadata resolution (one hash join) vs "
        "NNThroughputBenchmark -op open -threads 1000 -files 100000",
    }


if __name__ == "__main__":
    main()
