#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Timing = full query execution to a count-style sink (collect for small
results) after a shared-session warmup; parquet scans are re-read per query
(no caching) so scan cost is included, as it would be on a cluster.

Stall guard: this host shows sporadic multi-second hypervisor-steal stalls
that can straddle a full 3-rep window and inflate EVERY headline number at
once (BENCH_r12 shipped exactly that: a uniform 1.1-1.8x "regression" on
untouched queries with rep spreads as large as the values — the immediate
r13 re-run was back under the r11 total). Like sweep.py/scaling.py, the
bench therefore re-measures instead of trusting one window: after the
3-rep minimum, it keeps adding reps (cap 6) until the two FASTEST reps
agree within 25% + 50 ms — a stall can't pollute a growing window, while a
genuinely slow query agrees with itself immediately. The reps-used count
per query is recorded in the JSON so a guard-engaged run is visible.
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
    reps_used: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name, fn in workload.headline_queries().items():
        reps: list[float] = []
        n = 0
        # min-of-3 with spread, plus the stall guard (module docstring):
        # extra reps until the two fastest agree, so one steal window
        # can't ship an inflated minimum. A broken query records null +
        # its error and never kills the whole run.
        for _rep in range(6):
            try:
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                n = df.count()
                reps.append(time.perf_counter() - t0)
            except Exception as exc:
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
                break
            if len(reps) >= 3:
                fastest, second = sorted(reps)[:2]
                if second <= fastest * 1.25 + 0.05:
                    break
        if reps:
            timings[name] = round(min(reps), 3)
            spreads[name] = round(max(reps) - min(reps), 3)
            reps_used[name] = len(reps)
            print(
                f"# {name}: {timings[name]:.3f}s (+{spreads[name]:.3f}s "
                f"spread, {len(reps)} reps, {n} rows)",
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
        "reps": reps_used,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    try:
        out["control_plane"] = control_plane_open_bench(spark)
    except Exception as exc:  # auxiliary metric must never fail the bench
        print(f"# control_plane: FAILED {exc}", file=sys.stderr)

    # The driver records only a 2000-char TAIL of stdout; BENCH_r13 shipped
    # unparseable (parsed: null) when the full dict with spreads/reps/the
    # control-plane matrix outgrew that window and the capture started
    # mid-JSON. So: the FULL artifact goes to disk (BENCH_LOCAL.json, next
    # to this file, committed per round), and stdout gets ONE compact line
    # — metric/value/queries plus the single published control-plane
    # number — that stays far under the capture window.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    with open(full_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": timings,
        "sf": sf,
    }
    if errors:
        compact["errors"] = errors
    cp = out.get("control_plane")
    if isinstance(cp, dict):
        compact["open_ops_per_sec"] = cp.get("open_ops_per_sec")
    compact["detail"] = "BENCH_LOCAL.json"
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # never regress into the truncation failure mode
        del compact["queries"]
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()


def control_plane_open_bench(spark, n_files: int = 100_000, n_ops: int = 100_000):
    """Analog of the reference's NNThroughputBenchmark op matrix
    (Benchmarking.md:52-62; the guide publishes a number only for `open`:
    10,515 ops/s resolving 100,000 paths with 1000 threads — BASELINE.md).
    Here the namespace is a cached metadata DataFrame and each op class
    runs as ONE batched job — the engine-native way to do metadata ops at
    scale (a driver-side loop of 100k jobs would measure the scheduler,
    not the catalog):

      create      — build + materialize the 100k-file namespace
      mkdirs      — derive the distinct parent-directory set
      open        — resolve 100k paths in pseudo-random order (hash join)
      fileStatus  — same resolution returning the full metadata row
      rename      — rewrite 100k paths against a broadcast rename map
      delete      — anti-join a 50k delete list, count survivors
      blockReport — explode 64 blocks/file (6.4M block records), roll up
                    per block-pool (reported as block records/s)
    """
    from pyspark.sql import functions as F

    def path_expr(file_id):
        return F.concat_ws(
            "/",
            F.lit("/ThroughputBenchDir"),
            (file_id % 250).cast("string"),
            F.concat(F.lit("f"), file_id.cast("string")),
        )

    def timed(fn):
        t0 = time.perf_counter()
        n = fn()
        return n, time.perf_counter() - t0

    ops: dict[str, dict] = {}

    def record(name, n_ops_done, wall, unit="ops"):
        ops[name] = {
            "ops_per_sec": round(n_ops_done / wall, 1),
            "ops": n_ops_done,
            "wall_sec": round(wall, 3),
            "unit": unit,
        }

    cat = (
        spark.range(n_files)
        .select(
            path_expr(F.col("id")).alias("path"),
            (F.col("id") * 137 % 10_000_000).alias("length"),
            (F.col("id") % 3 + 1).alias("repl"),
            (F.col("id") % 64).alias("n_blocks"),
        )
        .repartition(32, "path")
        .cache()
    )
    _, w = timed(cat.count)
    record("create", n_files, w)

    _, w = timed(
        lambda: cat.select(
            F.expr("substring_index(path, '/', 3)").alias("dir")
        ).distinct().count()
    )
    record("mkdirs", n_files, w)

    # deterministic pseudo-random access order (48271 coprime to n_files)
    req = spark.range(n_ops).select(
        path_expr(F.col("id") * 48271 % n_files).alias("path")
    )
    n, w = timed(
        lambda: req.join(cat, "path")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("length"))
        .collect()[0].n
    )
    assert n == n_ops, f"unresolved opens: {n_ops - n}"
    record("open", n_ops, w)

    _, w = timed(
        lambda: req.join(cat, "path")
        .agg(
            F.count(F.lit(1)),
            F.sum("length"),
            F.sum("repl"),
            F.sum("n_blocks"),
            F.max("path"),
        )
        .collect()
    )
    record("fileStatus", n_ops, w)

    _, w = timed(
        lambda: cat.select(
            F.concat(F.lit("/renamed"), F.col("path")).alias("path"),
            "length",
        ).agg(F.count(F.lit(1)), F.max("path")).collect()
    )
    record("rename", n_files, w)

    dels = spark.range(n_files // 2).select(
        path_expr(F.col("id") * 2).alias("path")
    )
    _, w = timed(
        lambda: cat.join(dels, "path", "left_anti").count()
    )
    record("delete", n_files // 2, w)

    n_blocks, w = timed(
        lambda: cat.select(
            "path", F.explode(F.sequence(F.lit(1), F.col("n_blocks"))).alias("b")
        )
        .groupBy(F.col("b") % 8)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    record("blockReport", int(n_blocks), w, unit="block_records")

    cat.unpersist()
    return {
        "metric": "nn_throughput_analog_ops_per_sec",
        "open_ops_per_sec": ops["open"]["ops_per_sec"],
        "op_matrix": ops,
        "baseline_ref_open_ops_per_sec": 10515.25,
        "note": "batched metadata ops (one job per op class) vs "
        "NNThroughputBenchmark -threads 1000 -files 100000; the guide "
        "publishes a reference number only for `open`",
    }


if __name__ == "__main__":
    main()
