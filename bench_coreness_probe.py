#!/usr/bin/env python
"""1M-vertex coreness scale probe — A/B evidence for the histogram h-index.

Round 3 recorded 35 s/round (6 fixed rounds, 211 s) for coreness at
1M V / 8M E, local[8], 16 partitions, with the per-inbox window-sort
h-index.  This reruns the identical workload on the current code (the
``hindex.h_index_by`` histogram kernel) so BENCH/BASELINE.md can record
a like-for-like per-round number.

Usage: python bench_coreness_probe.py [--edges 8000000] [--vertices 1000000]
                                      [--rounds 6] [--cores 8]
Writes BENCH/coreness_probe_histogram.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from l_space_spark.operators.coreness import coreness  # noqa: E402
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
    spark = get_spark(app_name="coreness-probe", cores=args.cores,
                      shuffle_partitions=parts)
    edges = synth_powerlaw_edges(spark, args.edges, args.vertices,
                                 parts).persist()
    n_edges = edges.count()
    t0 = time.time()
    res = coreness(spark, edges, max_rounds=args.rounds, fixed_iters=True,
                   num_partitions=parts, resume=False)
    res.state.count()
    wall = time.time() - t0
    out = {
        "workload": "coreness fixed rounds, histogram h-index kernel",
        "cores": args.cores,
        "partitions": parts,
        "input_edges": n_edges,
        "vertices": args.vertices,
        "rounds": args.rounds,
        "wall_s": round(wall, 1),
        "s_per_round": round(wall / args.rounds, 1),
        "r3_window_sort_s_per_round": 35.0,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/coreness_probe_histogram.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
