#!/usr/bin/env python
"""Kill-and-resume probe at bench scale — evidence for the north rule's
"resumable from checkpoint with per-partition lineage + metrics".

Protocol (all phases are separate spark-submit processes, the real
launch mode):

1. COLD: fixed-20-superstep PageRank over the deterministic 1M V / 8M E
   power-law graph with a checkpoint dir; record wall + final state
   hash.
2. KILLED: same job against a FRESH dir, hard-killed (SIGKILL via
   ``timeout -s KILL``) mid-run — whatever superstep it was inside is
   left as a parquet dir without ``_meta.json``, which resume must
   ignore.
3. RESUME: rerun phase 2's command; record ``resumed_from``, the wall
   time, and the final state hash — which must equal phase 1's exactly
   (bit-identical resume, not just allclose).

Writes BENCH/resume_probe.json.

Usage: python bench_resume_probe.py [--kill-after 25] [--cores 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))

JOB = r"""
import sys, time
from pyspark.sql import SparkSession, functions as F
from l_space_spark.operators.pagerank import pagerank
from bench_scaling import synth_powerlaw_edges

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
ckpt = sys.argv[1]
edges = synth_powerlaw_edges(spark, 8_000_000, 1_000_000, 16).persist()
edges.count()
t0 = time.time()
res = pagerank(spark, edges, tol=-1.0, max_iters=20, num_partitions=16,
               checkpoint_dir=ckpt)
h = res.state.select(
    F.expr("bit_xor(xxhash64(id, cast(rank as string)))")
).collect()[0][0]
print("RESULT", res.resumed_from, res.iterations,
      round(time.time() - t0, 2), h, flush=True)
"""


def submit(jobfile: str, ckpt: str, cores: int, kill_after: float | None):
    cmd = ["spark-submit", "--master", f"local[{cores}]",
           "--driver-memory", "8g",
           "--py-files", os.path.join(tempfile.gettempdir(),
                                      "resume_probe_pkg.zip"),
           jobfile, ckpt]
    if kill_after is not None:
        cmd = ["timeout", "-s", "KILL", str(kill_after)] + cmd
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True,
                       cwd=tempfile.gettempdir())
    wall = time.time() - t0
    result = None
    for ln in p.stdout.splitlines():
        if ln.startswith("RESULT"):
            _, resumed, iters, job_wall, h = ln.split()
            result = dict(resumed_from=None if resumed == "None"
                          else int(resumed),
                          iterations=int(iters),
                          pagerank_wall_s=float(job_wall),
                          state_hash=int(h))
    return dict(exit=p.returncode, wall_s=round(wall, 2), result=result)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kill-after", type=float, default=25.0,
                    help="seconds before SIGKILL in phase 2 (must land "
                         "mid-run: after JVM boot, before superstep 20)")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    pkg = os.path.join(tempfile.gettempdir(), "resume_probe_pkg.zip")
    if os.path.exists(pkg):
        os.remove(pkg)
    subprocess.run(["zip", "-qr", pkg, "l_space_spark", "bench_scaling.py"],
                   cwd=REPO, check=True)
    jobfile = os.path.join(tempfile.gettempdir(), "resume_probe_job.py")
    with open(jobfile, "w") as f:
        f.write(JOB)

    base = tempfile.mkdtemp(prefix="resume_probe_")
    cold_dir, kill_dir = os.path.join(base, "cold"), os.path.join(base, "kill")

    cold = submit(jobfile, cold_dir, args.cores, None)
    killed = submit(jobfile, kill_dir, args.cores, args.kill_after)
    states_after_kill = sorted(
        d for d in os.listdir(kill_dir) if d.startswith("state_")
    ) if os.path.isdir(kill_dir) else []
    # a state dir without _meta.json = the superstep the kill interrupted
    orphans = [d for d in states_after_kill
               if not os.path.exists(os.path.join(kill_dir, d, "_meta.json"))]
    resumed = submit(jobfile, kill_dir, args.cores, None)

    out = {
        "workload": {"vertices": 1_000_000, "edges": 8_000_000,
                     "iters": 20, "cores": args.cores},
        "cold": cold,
        "killed": {"exit": killed["exit"], "wall_s": killed["wall_s"],
                   "kill_after_s": args.kill_after,
                   "checkpoints_on_disk": len(states_after_kill),
                   "orphan_state_dirs": orphans},
        "resumed": resumed,
        "bit_identical": bool(
            cold["result"] and resumed["result"]
            and cold["result"]["state_hash"]
            == resumed["result"]["state_hash"]),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "resume_probe.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
