"""Skewed-frontier move-join A/B (VERDICT r2 #3).

Fixture: 10M-edge / 1M-vertex graph where ONE celebrity vertex owns 25%
of all edges as `src`. A traversal move joins the frontier against the
edge table on `_id == src`; under any shuffle join the celebrity's 2.5M
edge rows land in ONE task (AQE skew-split only covers sort-merge, and
the frontier side carries no usable stats anyway after a checkpoint).
`hint_small()` broadcasts the frontier instead: the edge side is probed
in place across its balanced scan splits — no shuffle, no hot task.

The frontier is localCheckpoint-ed (exactly what `repeat()` hands the
body) so Catalyst sees the same no-stats LogicalRDD the real BFS loop
produces. Interleaved reps; writes BENCH/skew_frontier_ab.json.
"""
import json
import time

from pyspark.sql import SparkSession, functions as F

N_EDGES = 10_000_000
N_VERTS = 1_000_000


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from l_space_spark.traversal import Graph

    edges = spark.range(0, N_EDGES).select(
        F.when(F.col("id") % 4 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_VERTS))).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_VERTS)).alias("dst"),
    ).persist()
    n_e = edges.count()
    verts = spark.range(0, N_VERTS).select(F.col("id"))
    g = Graph.from_edgelist(edges, vertices=verts)

    from l_space_spark.traversal import Traversal

    # REALISTIC frontier: what repeat() actually hands the next round — a
    # checkpoint of the PREVIOUS move's deduped join output. (A frontier
    # built as a literal filter is useless as a fixture: Catalyst
    # propagates the filter through the join constraint into the edge
    # scan AND carries a small size estimate, so the plain path silently
    # auto-broadcasts and the A/B measures nothing — verified before
    # settling on this shape.) Stats on this checkpoint are join-output
    # estimates, so the static plan is a SortMergeJoin that re-shuffles
    # the |E| table every round; hop-1 from the celebrity+2 seeds lands
    # ~185k rows, under the 500k adaptive threshold.
    seeds = g.N().df.where(F.col("_id").isin(0, 17, 23))
    frontier = (
        Traversal(g, seeds, []).out().df.dropDuplicates(["_id"])
        .localCheckpoint(eager=True)
    )
    n_frontier = frontier.count()

    runs = []
    for rep in range(3):
        for mode in ("shuffle", "broadcast"):
            t = Traversal(g, frontier, [], small=(mode == "broadcast"))
            t0 = time.time()
            out = t.out().df.count()
            runs.append({"mode": mode, "rep": rep, "rows": out,
                         "wall_s": round(time.time() - t0, 3)})
            print(runs[-1], flush=True)

    with open("BENCH/skew_frontier_ab.json", "w") as fh:
        json.dump({
            "workload": {
                "edges": n_e, "vertices": N_VERTS,
                "frontier_rows": n_frontier,
                "frontier_shape": "checkpoint of hop-1 join output "
                                  "(celebrity + 2 seeds) — repeat()'s "
                                  "real per-round input",
                "skew": "vertex 0 owns 25% of all edge src slots",
                "parallelism": "local[8] / 16 shuffle partitions",
            },
            "runs": runs,
        }, fh, indent=2)
    print("wrote BENCH/skew_frontier_ab.json")


if __name__ == "__main__":
    main()
