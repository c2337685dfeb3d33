#!/usr/bin/env python
"""Densest-subgraph scale probe — the O(log V) peel at 1M V / 8M E.

Evidence that the Bahmani peel's plan survives 100×: per-round cost is
two semi-joins of the persisted edge table against a SHRINKING vertex
set plus one combiner-backed degree count, and the round count is
logarithmic, so wall time should be a small multiple of the edge-scan
time — not the 35 s/round regime the window-sort coreness once showed.

Usage: python bench_densest_probe.py [--edges 8000000]
       [--vertices 1000000] [--cores 8]
Writes BENCH/densest_probe.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from l_space_spark.operators.densest import (  # noqa: E402
    densest_subgraph,
    density_e6,
)
from l_space_spark.session import get_spark  # noqa: E402

from bench_scaling import synth_powerlaw_edges  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=8_000_000)
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    parts = 16
    spark = get_spark(app_name="densest-probe", cores=args.cores,
                      shuffle_partitions=parts)
    edges = synth_powerlaw_edges(spark, args.edges, args.vertices,
                                 parts).persist()
    n_edges = edges.count()
    t0 = time.time()
    res = densest_subgraph(spark, edges, num_partitions=parts)
    n_members = res.members.count()
    wall = time.time() - t0
    rounds = res.rounds
    if res.best_round < 0:
        raise SystemExit("empty peel: no rounds recorded")
    best = rounds[res.best_round]
    out = {
        "edges": n_edges,
        "vertices": args.vertices,
        "cores": args.cores,
        "partitions": parts,
        "rounds": len(rounds),
        "wall_s": round(wall, 1),
        "s_per_round": round(wall / max(1, len(rounds)), 2),
        "best_round": res.best_round,
        "best_nv": best[1],
        "best_ne": best[2],
        "best_density_e6": density_e6(best[1], best[2]),
        "members": n_members,
        "round_trace": [list(r) for r in rounds],
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/densest_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
