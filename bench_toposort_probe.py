#!/usr/bin/env python
"""1M-vertex dag_levels scale probe — per-round cost evidence.

Synthesizes a random DAG (the power-law edge table oriented low-id →
high-id, so acyclicity is by construction) at 1M V / 8M E and runs a
fixed number of longest-path relaxation rounds in METRIC mode (the
production convergence configuration: each round pays the superstep
join + max-combine plus the monotone change-count read), recording
s/round alongside the coreness/pagerank probes so BENCH/BASELINE.md can
compare the new operator's per-round cost like-for-like.

Usage: python bench_toposort_probe.py [--edges 8000000]
         [--vertices 1000000] [--rounds 8] [--cores 8]
Writes BENCH/toposort_probe.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from l_space_spark.operators.toposort import dag_levels  # noqa: E402
from l_space_spark.session import get_spark  # noqa: E402

from bench_scaling import synth_powerlaw_edges  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=8_000_000)
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    parts = 16
    spark = get_spark(app_name="toposort-probe", cores=args.cores,
                      shuffle_partitions=parts)
    raw = synth_powerlaw_edges(spark, args.edges, args.vertices, parts)
    dag = raw.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
    ).where(F.col("src") != F.col("dst")).persist()
    n_edges = dag.count()
    t0 = time.time()
    res = dag_levels(spark, dag, max_iters=args.rounds,
                     num_partitions=parts, resume=False)
    res.state.count()
    wall = time.time() - t0
    max_level = res.state.agg(F.max("level")).collect()[0][0]
    out = {
        "workload": "dag_levels metric-mode rounds, random 1M-vertex DAG",
        "cores": args.cores,
        "partitions": parts,
        "input_edges": n_edges,
        "vertices": args.vertices,
        "rounds_run": res.iterations,
        "converged": res.converged,
        "max_level_reached": max_level,
        "wall_s": round(wall, 1),
        "s_per_round": round(wall / max(res.iterations, 1), 1),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/toposort_probe.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
