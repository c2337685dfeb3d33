"""Coreness (core-number) decomposition — synchronous h-index dynamics.

``kcore.py`` answers "is v in the K-core?" for ONE k; this operator
computes every vertex's core number at once via the h-index iteration
of Lü, Chen, Zhang & Zhou (Nature Communications 2016): start from
``c₀(v) = deg(v)`` and repeatedly set

    c_{t+1}(v) = H({c_t(u) : u ∈ N(v)})

where ``H`` is the h-index (the largest h with ≥ h neighbors of value
≥ h). The sequence is non-increasing and converges exactly to the core
number — no global peeling order needed, which is what makes the
classic sequential algorithm unusable on a cluster and this one a
perfect superstep.

Spark shape per round: one message pass (state ⋈ src-partitioned
symmetric closure) then a per-vertex h-index via the histogram/count
kernel (``hindex.h_index_by``): combiner-backed ``groupBy(v, value)``
counts collapse a hub's inbox to its distinct values map-side, then a
suffix-count over ≤ O(√E) distinct values — no per-inbox sort, hub-safe
at 100×. Fixed-round mode replays for the unrolled SQL oracle, the
kcore/ktruss discipline.

Reference analog: none (as with the rest of the cohesion family);
``kcore_members``' fixed-k peeling remains for the membership question.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepResult, SuperstepRunner
from .components import undirect
from .hindex import h_index_by


def coreness(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 50,
    fixed_iters: bool = False,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id long, c long)`` — the
    core number of every vertex of the undirected simple graph
    (0 for isolated / self-loop-only vertices). ``fixed_iters=True``
    runs exactly ``max_rounds`` rounds (no-ops past convergence) so an
    unrolled oracle can replay the run."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    und = undirect(edges).repartition(num_partitions, "src").persist()
    all_ids = edges.select(F.col("src").alias("id")).unionByName(
        edges.select(F.col("dst").alias("id"))
    ).distinct()
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("c"))
    init = (
        all_ids.join(deg, all_ids["id"] == deg["src"], "left")
        .select("id", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        inbox = (
            state.hint("shuffle_hash")
            .join(und, state["id"] == und["src"])
            .select(F.col("dst").alias("v"), F.col("c").alias("cv"))
        )
        h = h_index_by(inbox, ["v"], "cv", out="h")
        return state.join(h, state["id"] == h["v"], "left").select(
            "id",
            F.least(
                F.col("c"), F.coalesce("h", F.lit(0))
            ).alias("c"),
        )

    def changed(old: DataFrame, new: DataFrame) -> float:
        return float(
            new.alias("n").join(old.alias("o"), "id")
            .where(F.col("n.c") != F.col("o.c")).count()
        )

    runner = SuperstepRunner(
        spark,
        max_iters=max_rounds,
        tol=-1.0 if fixed_iters else 0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "coreness", **(config_extra or {})},
    )
    try:
        result = runner.run(
            init, step, metric_fn=None if fixed_iters else changed,
            resume=resume,
        )
    finally:
        und.unpersist()
    return result
