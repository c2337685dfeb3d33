#!/usr/bin/env python
"""Back-to-back A/B for the CSR superstep kernels (round-3 VERDICT #1/#9).

Compares pagerank impl="dataframe" vs impl="csr" — and optionally the same
pair on a DIFFERENT checkout (``--alt-repo``, e.g. a git worktree at the
round-2 commit) — interleaved in one session of runs on one box, per the
noise methodology in BENCH/BASELINE.md §2 (only back-to-back comparisons
count; cross-session numbers are ±25% VM noise).

Each measurement is a fresh subprocess (own JVM) so package versions can't
bleed; the workload is the deterministic JVM-side power-law graph from
bench_scaling.py at avg degree 10 (1M V / 10M E), 8 fixed supersteps,
local[32]. Reported per run: wall (incl. one-time prepare/pack) and
steady-state s/superstep (mean of rounds 4..8, post-JIT — the number that
survives at scale).

Usage:
  python bench_csr_ab.py [--alt-repo /path/to/r2/worktree] [--reps 2]
                         [--cores 32] [--edges 10000000] [--vertices 1000000]
Writes BENCH/csr_ab.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_ONE = r"""
import json, sys, time
repo = sys.argv[1]
sys.path.insert(0, repo)
cores, n_edges, n_vertices, iters, impl = (
    int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5]),
    sys.argv[6])
from l_space_spark.session import get_spark
from l_space_spark.operators.pagerank import pagerank
from pyspark.sql import functions as F
parts = max(cores * 2, 16)
spark = get_spark(app_name=f"csr-ab-{impl}", cores=cores,
                  shuffle_partitions=parts)
spark.sparkContext.setLogLevel("ERROR")
# same generator as bench_scaling.synth_powerlaw_edges (inlined so the alt
# repo needs only l_space_spark on its path)
r = spark.range(0, n_edges, 1, parts)
u = (F.pmod(F.xxhash64("id", F.lit(11)), F.lit(1 << 20))
     / F.lit(float(1 << 20)))
src = F.pmod(F.xxhash64("id", F.lit(7)), F.lit(n_vertices))
dst = F.floor(F.lit(float(n_vertices)) * F.pow(u, F.lit(2.0))).cast("long")
edges = (r.select(src.alias("src"), dst.alias("dst"))
          .where(F.col("src") != F.col("dst")).persist())
ne = edges.count()
# warm the superstep path (JIT + Python worker pool) on a throwaway graph
tiny = spark.range(0, 1000).select(
    F.pmod(F.xxhash64("id"), F.lit(200)).alias("src"),
    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(200)).alias("dst"))
pagerank(spark, tiny, tol=-1.0, max_iters=2, resume=False,
         num_partitions=8, impl=impl).state.count()
t0 = time.time()
res = pagerank(spark, edges, tol=-1.0, max_iters=iters, resume=False,
               num_partitions=parts, impl=impl)
res.state.count()
wall = time.time() - t0
ss = res.superstep_seconds
steady = ss[3:] if len(ss) > 3 else ss
print("RESULT " + json.dumps({
    "impl": impl, "edges": ne, "supersteps": res.iterations,
    "wall_s": round(wall, 3),
    "steady_s_per_superstep": round(sum(steady) / len(steady), 3),
    "superstep_seconds": [round(s, 3) for s in ss],
}))
spark.stop()
"""


def run_one(repo: str, cores: int, edges: int, vertices: int, iters: int,
            impl: str) -> dict:
    cmd = [sys.executable, "-c", _ONE, repo, str(cores), str(edges),
           str(vertices), str(iters), impl]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1800,
                          cwd=repo)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from {impl}@{repo}:\n"
                       f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--alt-repo", default=None,
                    help="second checkout to interleave (e.g. r2 worktree)")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="BENCH/csr_ab.json")
    args = ap.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    repos = {"r3": here}
    if args.alt_repo:
        repos["alt"] = os.path.abspath(args.alt_repo)

    runs = []
    for rep in range(args.reps):
        for tag, repo in repos.items():
            for impl in ("dataframe", "csr"):
                r = run_one(repo, args.cores, args.edges, args.vertices,
                            args.iters, impl)
                r.update({"repo": tag, "rep": rep})
                print(json.dumps(r), flush=True)
                runs.append(r)

    out = {
        "workload": {
            "edges": args.edges, "vertices": args.vertices,
            "iters": args.iters, "cores": args.cores,
            "graph": "deg-10 power-law (bench_scaling generator)",
        },
        "runs": runs,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
