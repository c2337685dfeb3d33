#!/usr/bin/env python
"""Bridges scale probe — Euler-tour orientation on adversarially deep
trees and on a 1M V / 8M E power-law graph.

The old frontier-BFS tree orientation paid one Spark round per tree
LEVEL and refused past ``max_rounds`` — a 100k-vertex path was simply
out of reach (100k rounds). The Euler-tour list ranking is
O(log 2V) self-joins regardless of depth, so the SAME code handles:

1. ``path``: a 100k-vertex path (spanning tree depth 100k). Every edge
   is a bridge — exact count check.
2. ``ring``: the path closed into a cycle — zero bridges (one non-tree
   edge covers the whole tree). Exact check.
3. ``powerlaw``: 1M V / 8M E skewed graph — end-to-end wall for the
   general shape (most edges non-tree, XOR fold does the work).

Usage: python bench_bridges_probe.py [--path-n 100000]
       [--edges 8000000] [--vertices 1000000] [--cores 8]
Writes BENCH/bridges_probe.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from l_space_spark.operators.bridges import bridges  # noqa: E402
from l_space_spark.session import get_spark  # noqa: E402

from bench_scaling import synth_powerlaw_edges  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--path-n", type=int, default=100_000)
    ap.add_argument("--edges", type=int, default=8_000_000)
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    parts = 16
    spark = get_spark(app_name="bridges-probe", cores=args.cores,
                      shuffle_partitions=parts)
    out: dict = {"cores": args.cores, "partitions": parts}

    # 1. deep path: spanning tree depth = path_n, every edge a bridge
    n = args.path_n
    ids = spark.range(0, n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    ).repartition(parts).persist()
    ids.count()
    t0 = time.time()
    got = bridges(spark, ids, num_partitions=parts).count()
    out["path"] = {"vertices": n, "bridges": got,
                   "expected": n - 1, "wall_s": round(time.time() - t0, 2)}
    assert got == n - 1, f"path: {got} != {n - 1}"

    # 2. ring: one covering non-tree edge -> zero bridges
    ring = ids.unionByName(spark.createDataFrame(
        [(n - 1, 0)], "src long, dst long"))
    t0 = time.time()
    got = bridges(spark, ring, num_partitions=parts).count()
    out["ring"] = {"vertices": n, "bridges": got, "expected": 0,
                   "wall_s": round(time.time() - t0, 2)}
    assert got == 0, f"ring: {got} != 0"
    ids.unpersist()

    # 3. power-law bulk shape
    edges = synth_powerlaw_edges(spark, args.edges, args.vertices,
                                 parts).persist()
    n_edges = edges.count()
    t0 = time.time()
    got = bridges(spark, edges, num_partitions=parts).count()
    out["powerlaw"] = {"edges": n_edges, "vertices": args.vertices,
                       "bridges": got,
                       "wall_s": round(time.time() - t0, 2)}

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/bridges_probe.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
