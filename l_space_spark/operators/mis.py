"""Maximal independent set — Luby's algorithm with deterministic
per-round hash priorities.

The classic O(log n)-round distributed MIS (Luby 1986): each round every
still-active vertex draws a priority — here the portable 60-bit hash of
``(seed, round, id)`` instead of ``Math.random()``, making the run
deterministic, resumable, and exactly reproducible in SQL — and joins
the set iff its priority is strictly smaller than every active
neighbor's; neighbors of new members drop out. Two adjacent actives can
never both win (strict inequality both ways is impossible), so the
result is independent; a vertex only deactivates when it or a neighbor
joins, so it is maximal. A 60-bit hash collision between neighbors
stalls neither engine differently — both see the same values — so the
oracle contract survives even the ~n²/2⁶⁰ corner (documented, not
tie-broken, matching the SQL twin).

Scale shape per round: two message passes over the symmetric closure —
(1) min active-neighbor priority (map-side-combinable ``min``), (2) the
excluded-neighbor semi-join — with the |E| closure persisted
src-partitioned once (join key aligned, the plan-audited pattern), so
only |V_active|-row tables shuffle. Runs on SuperstepRunner
(metric = remaining active count, tol 0) for checkpoints/resume.

Reference analog: none (the reference has no per-element random
priority primitive at all — ``Coin`` is Bernoulli row sampling,
``step/Coin.scala``); MIS is the standard building block the engine
adds for scheduling/coloring workloads on link graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from ..functions.text import hash60
from ..plans.superstep import SuperstepResult, SuperstepRunner
from .components import undirect


def maximal_independent_set(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 20,
    seed: str = "mis",
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id long, st int)``:
    st 1 = in the MIS, 2 = excluded (has an MIS neighbor), 0 = still
    undecided (only if ``max_rounds`` was too small — converged runs
    have none). Self-loops are dropped by the symmetric closure (a
    self-looped vertex is its own neighbor under the strict-inequality
    rule and could never join; graph-theoretically it CAN, so we follow
    the standard simple-graph reading)."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    und = (
        undirect(edges).repartition(num_partitions, "src").persist()
    )
    # isolated vertices (only self-loops / no edges) never see a message
    # and win in round 1, which is correct: they always belong to an MIS
    all_ids = edges.select(F.col("src").alias("id")).unionByName(
        edges.select(F.col("dst").alias("id"))
    ).distinct()

    init = all_ids.select("id", F.lit(0).alias("st"))

    def step(state: DataFrame, i: int) -> DataFrame:
        act = state.where(F.col("st") == 0).select(
            "id",
            hash60(
                F.concat_ws(
                    ":", F.lit(seed), F.lit(str(i)),
                    F.col("id").cast("string"),
                )
            ).alias("p"),
        ).localCheckpoint(eager=True).transform(strip_plan_stats)

        # pass 1: min priority among ACTIVE neighbors
        msgs = (
            act.hint("shuffle_hash")
            .join(und, act["id"] == und["src"])
            .groupBy("dst")
            .agg(F.min("p").alias("np"))
        )
        winners = (
            act.join(msgs.hint("shuffle_hash"),
                     act["id"] == msgs["dst"], "left")
            .where(F.col("np").isNull() | (F.col("p") < F.col("np")))
            .select(act["id"])
            .localCheckpoint(eager=True).transform(strip_plan_stats)
        )
        # pass 2: active neighbors of winners drop out
        excluded = (
            winners.hint("shuffle_hash")
            .join(und, winners["id"] == und["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        w = winners.select("id", F.lit(1).alias("__w"))
        x = excluded.select("id", F.lit(2).alias("__x"))
        return (
            state.join(w, "id", "left")
            .join(x, "id", "left")
            .select(
                "id",
                F.when(F.col("st") != 0, F.col("st"))
                .when(F.col("__w").isNotNull(), F.lit(1))
                .when(F.col("__x").isNotNull(), F.lit(2))
                .otherwise(F.lit(0))
                .alias("st"),
            )
        )

    def remaining(old: DataFrame, new: DataFrame) -> float:
        return float(new.where(F.col("st") == 0).count())

    runner = SuperstepRunner(
        spark,
        max_iters=max_rounds,
        tol=0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "mis", "seed": seed, **(config_extra or {})},
    )
    try:
        result = runner.run(init, step, metric_fn=remaining, resume=resume)
    finally:
        und.unpersist()
    return result
