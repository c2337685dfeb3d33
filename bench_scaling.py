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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=8_000_000)
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--impl", default="dataframe", choices=["dataframe", "csr"])
    ap.add_argument("--out", default="BENCH/scaling.json")
    args = ap.parse_args()

    levels = [int(c) for c in args.cores.split(",")]
    runs = [run_once(c, args.edges, args.vertices, args.iters, args.impl)
            for c in levels]

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
