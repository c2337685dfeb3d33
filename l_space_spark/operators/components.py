"""Connected components — hash-min label broadcast over the undirected graph.

State: ``(id, component)`` initialized to ``component = id``. Each superstep
every vertex adopts the minimum component id among itself and its neighbors
(both edge directions); convergence when no vertex changes. O(diameter)
supersteps — fine for social/link graphs (small diameter); for pathological
long-chain graphs the large-star/small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond") halves rounds — noted as the
upgrade path, same state schema.

Reference analog: none built in; L-space would express this as
``Repeat(out/in ∪ identity → min)`` (``step/Repeat.scala:100``).
Result matches the recursive-CTE min-reachability oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepRunner, SuperstepResult


def undirect(edges: DataFrame) -> DataFrame:
    """Distinct symmetric closure (both directions), self-loops dropped."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 100,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id long, component long)``.

    ``component`` = min vertex id of the (weakly) connected component.
    """
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    und = undirect(edges).repartition(num_partitions, "src").persist()
    if vertices is None:
        vertices = und.select(F.col("src").alias("id")).distinct()
    else:
        vertices = vertices.select("id").distinct()
    vertices = vertices.persist()

    init = vertices.select("id", F.col("id").alias("component"))

    def step(state: DataFrame, i: int) -> DataFrame:
        # shuffle_hash hint (same rationale as pagerank): broadcasting the
        # |V|-row state every round serializes on the driver, and the SMJ
        # alternative re-sorts the |E|-row und cache every round; a shuffled
        # hash join moves only the state and reuses und's persisted src
        # partitioning
        msgs = (
            state.hint("shuffle_hash").join(und, state["id"] == und["src"])
            .groupBy("dst")
            .agg(F.min("component").alias("nbr_min"))
        )
        return state.join(msgs.hint("shuffle_hash"),
                          state["id"] == msgs["dst"], "left").select(
            state["id"],
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_min"), F.col("component")),
            ).alias("component"),
        )

    def changed_count(old: DataFrame, new: DataFrame) -> float:
        return float(
            new.alias("n")
            .join(old.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )

    runner = SuperstepRunner(
        spark,
        max_iters=max_iters,
        tol=0.0,  # converged when zero vertices changed
        checkpoint_dir=checkpoint_dir,
        config={"algo": "connected_components"},
    )
    result = runner.run(init, step, metric_fn=changed_count, resume=resume)
    und.unpersist()
    vertices.unpersist()
    return result
