#!/usr/bin/env python
"""1M-vertex Louvain phase-1 scale probe — per-round cost evidence.

Synthesizes the power-law graph at 1M V / 8M E and runs a fixed number
of synchronized local-move rounds (fixed mode — every round pays the
full move-step joins; metric mode adds only a |V|-row changed-count
read on top), recording s/round alongside the coreness/dag_levels/
pagerank probes so BENCH/BASELINE.md can compare the new operator's
per-round cost like-for-like.

Usage: python bench_louvain_probe.py [--edges 8000000]
         [--vertices 1000000] [--rounds 6] [--cores 8]
Writes BENCH/louvain_probe.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from l_space_spark.operators.louvain import louvain_communities  # noqa: E402
from l_space_spark.session import get_spark  # noqa: E402

from bench_scaling import synth_powerlaw_edges  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=8_000_000)
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    parts = 16
    spark = get_spark(app_name="louvain-probe", cores=args.cores,
                      shuffle_partitions=parts)
    edges = synth_powerlaw_edges(spark, args.edges, args.vertices,
                                 parts).persist()
    n_edges = edges.count()
    t0 = time.time()
    res = louvain_communities(spark, edges, max_iters=args.rounds,
                              fixed_iters=True, num_partitions=parts,
                              resume=False)
    res.state.count()
    wall = time.time() - t0
    n_coms = res.state.select("com").distinct().count()
    out = {
        "workload": "louvain fixed local-move rounds, 1M-vertex power law",
        "cores": args.cores,
        "vertices": args.vertices,
        "edges": n_edges,
        "rounds": args.rounds,
        "wall_s": round(wall, 1),
        "s_per_round": round(wall / args.rounds, 2),
        "communities": n_coms,
        "secs_per_iter": [round(s, 2) for s in res.superstep_seconds],
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/louvain_probe.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
