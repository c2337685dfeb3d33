"""Single-source shortest paths — Bellman-Ford relaxation as supersteps.

Reference analog: none built in (like PageRank/CC/LP, L-space would write
this as a ``Repeat`` of weighted moves, ``step/Repeat.scala:100``); here it
is the standard message-passing formulation on the shared runner
(plans/superstep.py): state ``(id, dist)``, each superstep relaxes every
edge once — ``dist ⋈ edges ON id = src → groupBy(dst).min(dist + w)`` —
and takes the elementwise minimum with the previous state. Converges in
O(longest shortest-path hop count) rounds; each round shuffles the |V|-row
state and a pre-partitioned edge table exactly like the other algorithms
(same plan shape, same persistence discipline).

Distances are INTEGER (long): training-data link graphs carry integral
weights (hop counts, import multiplicities), integer min/plus is exact —
no fp tolerance needed anywhere, and the unrolled-CTE SQL oracle matches
bit-for-bit. Unreachable vertices keep ``dist = NULL``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepRunner, SuperstepResult


def sssp(
    spark: SparkSession,
    edges: DataFrame,
    source: int,
    weight_col: str | None = None,
    max_iters: int = 50,
    fixed_iters: bool = False,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id long, dist long)``;
    ``dist`` = weight of the lightest directed path from ``source``
    (NULL = unreachable). ``weight_col`` defaults to weight 1 per edge
    (hop counts); weights must be non-negative longs — parallel edges
    keep their MINIMUM weight (the lightest parallel edge dominates any
    shortest path)."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    e = (
        edges.select("src", "dst", w.alias("w"))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst").agg(F.min("w").alias("w"))
        .repartition(num_partitions, "src")
        .persist()
    )
    vertices = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )

    init = vertices.select(
        "id",
        F.when(F.col("id") == source, F.lit(0).cast("long")).alias("dist"),
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        relaxed = (
            state.where(F.col("dist").isNotNull())
            .hint("shuffle_hash")
            .join(e, state["id"] == e["src"])
            .groupBy("dst")
            .agg(F.min(F.col("dist") + F.col("w")).alias("nd"))
        )
        return state.join(relaxed.hint("shuffle_hash"),
                          state["id"] == relaxed["dst"], "left").select(
            state["id"],
            F.least(
                F.coalesce(F.col("dist"), F.col("nd")),
                F.coalesce(F.col("nd"), F.col("dist")),
            ).alias("dist"),
        )

    def changed_count(old: DataFrame, new: DataFrame) -> float:
        return float(
            new.alias("n")
            .join(old.alias("o"), "id")
            .where(~F.col("n.dist").eqNullSafe(F.col("o.dist")))
            .count()
        )

    runner = SuperstepRunner(
        spark,
        max_iters=max_iters,
        tol=-1.0 if fixed_iters else 0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "sssp", "source": int(source),
                "weight_col": weight_col, "fixed": fixed_iters,
                **(config_extra or {})},
    )
    try:
        result = runner.run(
            init, step, metric_fn=None if fixed_iters else changed_count,
            resume=resume,
        )
    finally:
        e.unpersist()
        vertices.unpersist()
    return result
