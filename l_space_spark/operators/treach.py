"""Temporal reachability — earliest-arrival times over a contact graph.

A temporal edge ``(src, dst, t)`` is a contact usable only at its own
instant: a time-respecting path must traverse edges in non-decreasing
time. ``earliest_arrival`` computes, for every vertex reachable from a
seed set, the minimum arrival time over all time-respecting paths — the
primitive behind influence/contagion reach, freshness propagation
(which repos see a poisoned commit, and when), and temporal closeness.

Reference analog: none — the reference's ``Repeat`` (core
``step/Repeat.scala``) can iterate moves but has no notion of edge
time; this is the temporal generalization of its BFS family.

Semantics. ``arrival(seed) = start_t``; an edge ``(u, v, t)`` relaxes
``v`` to ``min(arrival(v), t)`` whenever ``t ≥ arrival(u)``. That
update is monotone (arrivals only decrease, usable edge sets only grow
as arrivals decrease), so the fixpoint is UNIQUE and order-independent
— which is what lets an unrolled fixed-round SQL oracle agree exactly
with the converged distributed run.

Scale shape: the state is one row per REACHED vertex (never |V| until
everything is reached); each superstep joins only the IMPROVED frontier
against the contact table (pre-repartitioned on ``src`` and persisted
once — the PageRank links discipline), then a combiner-backed
``min`` per destination and a frontier-sized merge back into the state.
Rounds ≤ the temporal-hop diameter. Checkpoint/resume via the standard
superstep runner (north rule: per-partition lineage + metrics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepResult, SuperstepRunner


def earliest_arrival(
    spark: SparkSession,
    tedges: DataFrame,
    seeds: DataFrame,
    start_t: int = 0,
    max_rounds: int = 50,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
    time_col: str = "t",
) -> SuperstepResult:
    """Earliest-arrival state ``(id long, arrival long, improved boolean)``
    from ``seeds(id)`` over ``tedges(src, dst, t)``; only reached vertices
    appear. ``improved`` marks the last round's frontier (all False at
    convergence). Self-loops are inert (they can never improve) and are
    dropped up front."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    contacts = (
        tedges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.col(time_col).cast("long").alias("t"),
        )
        .where(F.col("src") != F.col("dst"))
        .repartition(num_partitions, "src")
        .persist()
    )

    seed_ids = seeds.select(F.col("id").cast("long").alias("id")).distinct()
    # the seed set DEFINES the run: pin a fingerprint into the checkpoint
    # config so resume against a different seed set is refused, not mixed
    # (the sssp source / pagerank seed-count convention)
    fp = seed_ids.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(id))"), F.lit(0)).alias("h"),
    ).collect()[0]
    init = seed_ids.select(
        "id",
        F.lit(int(start_t)).cast("long").alias("arrival"),
        F.lit(True).alias("improved"),
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        frontier = state.where(F.col("improved")).select("id", "arrival")
        cand = (
            frontier.join(contacts, frontier["id"] == contacts["src"])
            .where(F.col("t") >= F.col("arrival"))
            .groupBy("dst")
            .agg(F.min("t").alias("cand"))
        )
        merged = (
            state.select("id", "arrival")
            .join(cand, state["id"] == cand["dst"], "full_outer")
            .select(
                F.coalesce("id", "dst").alias("id"),
                # least() skips nulls: new vertex → cand, no message → old
                F.least("arrival", "cand").alias("arrival"),
                F.coalesce(
                    F.col("arrival").isNull()
                    | (F.col("cand") < F.col("arrival")),
                    F.lit(False),
                ).alias("improved"),
            )
        )
        return merged

    def n_improved(old: DataFrame, new: DataFrame) -> float:
        return float(new.where(F.col("improved")).count())

    runner = SuperstepRunner(
        spark,
        max_iters=max_rounds,
        tol=0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "earliest_arrival", "start_t": int(start_t),
                "seeds_n": int(fp["n"]), "seeds_fp": int(fp["h"]),
                **(config_extra or {})},
    )
    try:
        return runner.run(init, step, metric_fn=n_improved, resume=resume)
    finally:
        contacts.unpersist()


def arrivals(result: SuperstepResult) -> DataFrame:
    """The reachability readout ``(id, arrival)`` of a finished run."""
    return result.state.select("id", "arrival")
