"""Maximal matching — deterministic locally-dominant edge matching.

The distributed classic (Preis 1999; Manne & Bisseling 2007): each round
every LIVE edge computes whether it is the minimum-priority live edge at
BOTH of its endpoints; locally-dominant edges join the matching, their
endpoints retire, and incident live edges drop out. Two adjacent edges
can never both dominate (they share an endpoint, where only one can be
the minimum under a strict order), so the result is a matching; a live
edge only drops when an endpoint is matched, so it is maximal.

Priorities here are the portable 60-bit hash of ``(seed, a, b)`` and the
round order is the strict total order ``(pri, a, b)`` — which makes the
result exactly the SEQUENTIAL GREEDY matching over that order: the
globally minimum live edge is always locally dominant (so it is matched
the same round greedy would take it), and every edge a dominant round
removes is an edge greedy would also skip (it shares an endpoint with a
smaller matched edge). That equivalence is what lets the DuckDB oracle
replay the algorithm as a recursive-CTE greedy scan and match exactly.

Scale shape per round: one explode of live edges into endpoint messages,
one map-side-combinable ``min(struct)`` groupBy per vertex, two
broadcast-free equi-joins back to the live table, and two anti-joins to
drop retired endpoints — everything keyed on vertex or edge ids, no
all-pairs step anywhere. Expected rounds are O(log |E|) with hashed
priorities (each round removes the globally-min edge and, in
expectation, a constant fraction of the rest). State is the live+matched
edge table itself (≤ |E| rows, shrinking monotonically), run on
SuperstepRunner for checkpoint/resume and per-round metrics.

Reference analog: none — L-space has no matching primitive; like MIS and
coloring this is a standard building block the engine adds for
scheduling/anti-coalescing workloads on link graphs (e.g. pairing
mirror repositories so each pair is processed once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from ..functions.text import hash60
from ..plans.superstep import SuperstepResult, SuperstepRunner


def maximal_matching(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 30,
    seed: str = "match",
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(a long, b long, pri long,
    st int)`` over canonical undirected edges (a < b, self-loops
    dropped): st 1 = matched, 0 = still live (converged runs have
    none — every live edge has two free endpoints, and the minimum of
    those is dominant, so each round makes progress until empty)."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    canon = (
        edges.select(
            F.least("src", "dst").cast("long").alias("a"),
            F.greatest("src", "dst").cast("long").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    init = canon.select(
        "a",
        "b",
        hash60(
            F.concat_ws(
                ":", F.lit(seed),
                F.col("a").cast("string"), F.col("b").cast("string"),
            )
        ).alias("pri"),
        F.lit(0).alias("st"),
    ).repartition(num_partitions, "a")

    def step(state: DataFrame, i: int) -> DataFrame:
        done = state.where(F.col("st") == 1)
        # localCheckpoint: ``live`` feeds the endpoint explode, two
        # dominance joins, and two anti-joins — five plan references;
        # left lazy each would recompute the upstream state filter
        live = state.where(F.col("st") == 0).localCheckpoint(eager=True).transform(strip_plan_stats)
        ends = live.select(F.col("a").alias("v"), "pri", "a", "b").unionByName(
            live.select(F.col("b").alias("v"), "pri", "a", "b")
        )
        # strict total order (pri, a, b): hash collisions between
        # incident edges (~2^-60) fall through to the id tiebreak, so
        # ``min(struct)`` is a strict minimum and dominance stays
        # well-defined — the same order the greedy oracle scans in
        best = ends.groupBy("v").agg(
            F.min(F.struct("pri", "a", "b")).alias("be")
        )
        edge_key = F.struct("pri", "a", "b")
        winners = (
            live.join(best.hint("shuffle_hash"), live["a"] == best["v"])
            .where(F.col("be") == edge_key)
            .select("a", "b", "pri")
        )
        winners = (
            winners.join(best.hint("shuffle_hash"), winners["b"] == best["v"])
            .where(F.col("be") == edge_key)
            .select("a", "b", "pri")
            .localCheckpoint(eager=True).transform(strip_plan_stats)  # read by taken + the union below
        )
        taken = (
            winners.select(F.col("a").alias("v"))
            .unionByName(winners.select(F.col("b").alias("v")))
        )
        survivors = (
            live.join(taken.hint("shuffle_hash"),
                      live["a"] == taken["v"], "left_anti")
            .join(taken.hint("shuffle_hash"),
                  F.col("b") == taken["v"], "left_anti")
        )
        return (
            done.unionByName(winners.select("a", "b", "pri",
                                            F.lit(1).alias("st")))
            .unionByName(survivors)
        )

    def remaining(old: DataFrame, new: DataFrame) -> float:
        return float(new.where(F.col("st") == 0).count())

    runner = SuperstepRunner(
        spark,
        max_iters=max_rounds,
        tol=0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "maximal_matching", "seed": seed,
                **(config_extra or {})},
    )
    return runner.run(init, step, metric_fn=remaining, resume=resume)
