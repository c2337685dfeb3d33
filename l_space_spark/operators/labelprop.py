"""Label propagation (community detection) — synchronous, deterministic.

Each superstep every vertex adopts the most frequent label among its
neighbors (undirected); ties broken by the MINIMUM label (determinism rule,
FIXTURES.md F4); vertices with no neighbors keep their label. Synchronous
updates + min-label tie-break make the result an exact, order-independent
function of the graph — required for the exact-match oracle.

The per-vertex argmax is computed JVM-side without a window sort:
``max(struct(cnt, -label))`` — struct ordering gives max count then min
label. Convergence: number of vertices whose label changed == 0, or
``max_iters`` (LP may oscillate on bipartite structures; a fixed-round mode
``tol<0`` is the oracle-comparable form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepRunner, SuperstepResult
from .components import undirect


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 20,
    fixed_iters: bool = False,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id long, label long)``."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    und = undirect(edges).repartition(num_partitions, "src").persist()
    if vertices is None:
        vertices = und.select(F.col("src").alias("id")).distinct()
    else:
        vertices = vertices.select("id").distinct()
    vertices = vertices.persist()

    init = vertices.select("id", F.col("id").alias("label"))

    def step(state: DataFrame, i: int) -> DataFrame:
        # shuffle_hash: move only the |V|-row state; reuse und's persisted
        # src partitioning (see components.py step for the full rationale)
        nbr_labels = state.hint("shuffle_hash").join(
            und, state["id"] == und["src"]
        ).select(
            F.col("dst").alias("vid"), "label"
        )
        counts = nbr_labels.groupBy("vid", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        best = counts.groupBy("vid").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("m")
        ).select("vid", (-F.col("m.neg")).alias("new_label"))
        return state.join(best.hint("shuffle_hash"),
                          state["id"] == best["vid"], "left").select(
            state["id"],
            F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
        )

    def changed_count(old: DataFrame, new: DataFrame) -> float:
        return float(
            new.alias("n")
            .join(old.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )

    runner = SuperstepRunner(
        spark,
        max_iters=max_iters,
        tol=-1.0 if fixed_iters else 0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "label_propagation", "fixed": fixed_iters},
    )
    result = runner.run(
        init, step, metric_fn=None if fixed_iters else changed_count, resume=resume
    )
    und.unpersist()
    vertices.unpersist()
    return result
