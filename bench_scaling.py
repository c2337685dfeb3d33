#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule: the same PageRank job at
two parallelism levels (local[N] vs local[4N]) on the same input.

The sandbox has no multi-node cluster; per the driver instruction the N→4N
executor-scaling criterion is proxied by thread parallelism on one machine
(shared memory bandwidth makes this a LOWER bound on what separate
executors with private memory channels would show).

Workload: fixed-superstep PageRank over a deterministic synthetic power-law
graph generated entirely JVM-side (xxhash64 of a range — no Python, no I/O),
so the measurement isolates the engine's join/aggregate/shuffle path.

Usage:
  python bench_scaling.py [--edges 8000000] [--vertices 1000000]
                          [--iters 5] [--cores 8,32]
Writes BENCH/scaling.json and prints a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from l_space_spark.operators.pagerank import pagerank  # noqa: E402
from l_space_spark.session import get_spark  # noqa: E402


def synth_powerlaw_edges(spark: SparkSession, n_edges: int, n_vertices: int,
                         parts: int):
    """Deterministic skewed edge table, pure Catalyst expressions."""
    r = spark.range(0, n_edges, 1, parts)
    u = (F.pmod(F.xxhash64("id", F.lit(11)), F.lit(1 << 20))
         / F.lit(float(1 << 20)))
    src = F.pmod(F.xxhash64("id", F.lit(7)), F.lit(n_vertices))
    dst = F.floor(F.lit(float(n_vertices)) * F.pow(u, F.lit(2.0))).cast("long")
    return (
        r.select(src.alias("src"), dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )


def run_once(cores: int, n_edges: int, n_vertices: int, iters: int,
             impl: str = "dataframe") -> dict:
    shuffle_parts = max(cores * 2, 16)
    spark = get_spark(
        app_name=f"scaling-local-{cores}",
        cores=cores,
        shuffle_partitions=shuffle_parts,
    )
    try:
        edges = synth_powerlaw_edges(spark, n_edges, n_vertices, shuffle_parts)
        edges = edges.persist()
        real_edges = edges.count()  # materialize input outside the clock
        t0 = time.time()
        res = pagerank(spark, edges, tol=-1.0, max_iters=iters, resume=False,
                       num_partitions=shuffle_parts, impl=impl)
        res.state.count()
        wall = time.time() - t0
        # distinct-edge count is what each superstep actually processes
        processed = res.state.sparkSession.createDataFrame([], "x int")  # noqa
        return {
            "cores": cores,
            "impl": impl,
            "input_edges": real_edges,
            "supersteps": res.iterations,
            "wall_s": round(wall, 3),
            "supersteps_per_s": round(res.iterations / wall, 4),
            "edges_per_s": round(res.iterations * real_edges / wall, 1),
        }
    finally:
        spark.stop()


_PROC_JOB = r"""
import json, sys, time
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder
         .config("spark.sql.shuffle.partitions", sys.argv[5])
         .config("spark.sql.adaptive.enabled", "true").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from bench_scaling import synth_powerlaw_edges
from l_space_spark.operators.pagerank import pagerank
workers, n_edges, n_vertices, iters, parts = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    int(sys.argv[5]))
impl = sys.argv[6]
edges = synth_powerlaw_edges(spark, n_edges, n_vertices, parts).persist()
ne = edges.count()
t0 = time.time()
res = pagerank(spark, edges, tol=-1.0, max_iters=iters, resume=False,
               num_partitions=parts, impl=impl)
res.state.count()
wall = time.time() - t0
print("RESULT " + json.dumps({
    "cores": workers, "impl": impl, "input_edges": ne,
    "supersteps": res.iterations, "wall_s": round(wall, 3),
    "supersteps_per_s": round(res.iterations / wall, 4),
    "edges_per_s": round(res.iterations * ne / wall, 1),
    "mode": "process-isolated",
}))
spark.stop()
"""


def run_once_processes(workers: int, n_edges: int, n_vertices: int,
                       iters: int, impl: str = "dataframe") -> dict:
    """One rung with REAL process isolation: `local-cluster[workers,1,3072]`
    launches ``workers`` separate single-core executor JVMs (each with its
    own Python worker), shuffle over loopback — the closest one-box proxy
    to N executors (vs. `run_once`'s N threads in one JVM). ~4× slower to
    start (worker JVM boot) and pays IPC shuffle serialization the thread
    mode doesn't; see BENCH/BASELINE.md for the measured comparison."""
    import subprocess
    import tempfile
    import zipfile

    repo = os.path.dirname(os.path.abspath(__file__))
    parts = 16
    with tempfile.TemporaryDirectory() as td:
        pkg = os.path.join(td, "pkg.zip")
        with zipfile.ZipFile(pkg, "w") as z:
            lib = os.path.join(repo, "l_space_spark")
            for root, _, files in os.walk(lib):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, repo))
            z.write(os.path.join(repo, "bench_scaling.py"), "bench_scaling.py")
        job = os.path.join(td, "job.py")
        with open(job, "w") as f:
            f.write(_PROC_JOB)
        cmd = [
            "spark-submit", "--master", f"local-cluster[{workers},1,3072]",
            "--py-files", pkg, job, str(workers), str(n_edges),
            str(n_vertices), str(iters), str(parts), impl,
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=1800)
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        raise RuntimeError(
            f"no RESULT line from {cmd}:\n{proc.stdout[-2000:]}\n"
            f"{proc.stderr[-2000:]}"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=8_000_000)
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--impl", default="dataframe", choices=["dataframe", "csr"])
    ap.add_argument("--processes", action="store_true",
                    help="local-cluster worker JVMs instead of local[N] "
                         "threads (N = each --cores level)")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run each rung N times INTERLEAVED (lo,hi,lo,hi,…) "
                         "and keep the per-rung best — the sandbox VM's "
                         "ambient throughput drifts ~2x on minute scales, "
                         "and a single lo/hi pair sampled minutes apart "
                         "measures that drift, not the scaling; "
                         "interleaving + min() cancels it")
    ap.add_argument("--out", default="BENCH/scaling.json")
    args = ap.parse_args()

    levels = [int(c) for c in args.cores.split(",")]
    runner = run_once_processes if args.processes else run_once
    best: dict[int, dict] = {}
    all_walls: dict[int, list] = {c: [] for c in levels}
    for _rep in range(max(1, args.repeat)):
        for c in levels:
            r = runner(c, args.edges, args.vertices, args.iters, args.impl)
            all_walls[c].append(r["wall_s"])
            if c not in best or r["wall_s"] < best[c]["wall_s"]:
                best[c] = r
    runs = [best[c] for c in levels]
    if args.repeat > 1:
        for r in runs:
            r["all_wall_s"] = all_walls[r["cores"]]

    lo, hi = runs[0], runs[-1]
    ratio = hi["edges_per_s"] / lo["edges_per_s"]
    factor = hi["cores"] / lo["cores"]
    efficiency = ratio / factor
    out = {
        "workload": {
            "edges": args.edges, "vertices": args.vertices,
            "iters": args.iters, "algo": "pagerank-fixed", "impl": args.impl,
        },
        "runs": runs,
        "speedup": round(ratio, 3),
        "core_factor": factor,
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
