"""k-core decomposition — iterative peeling of low-degree vertices.

The k-core is the maximal induced subgraph where every vertex has degree
≥ k (undirected, deduplicated, self-loops dropped) — the classic
link-graph quality/spam filter (low-core pages are weakly embedded).
Reference analog: none built in; the peeling loop is another ``Repeat``
instantiation on the shared superstep runner.

Each superstep removes every vertex whose degree in the CURRENT induced
subgraph is < k — synchronous batch peeling, so the result is the exact
k-core in at most O(V) rounds (usually far fewer). State = the surviving
vertex set; the induced edge set is re-derived by two semi-joins against
the persisted canonical edge table (edge table shuffled once, per-round
shuffles carry vertex-row state only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepRunner, SuperstepResult


def kcore(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 3,
    max_iters: int = 50,
    fixed_iters: bool = False,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id long, core_deg long)`` —
    the members of the k-core with their degree inside it. ``fixed_iters``
    runs exactly ``max_iters`` peels (the oracle-comparable mode; extra
    rounds past convergence are no-ops)."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    canon = (
        edges.select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .repartition(num_partitions, "a")
        .persist()
    )
    nbrs = canon.select(F.col("a").alias("id"), F.col("b").alias("nbr")).unionByName(
        canon.select(F.col("b").alias("id"), F.col("a").alias("nbr"))
    )

    init = (
        nbrs.groupBy("id").agg(F.count(F.lit(1)).alias("core_deg"))
        .where(F.col("core_deg") >= k)
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        survivors = state.select("id")
        alive = (
            nbrs.join(survivors.hint("shuffle_hash"), "id", "left_semi")
            .join(
                survivors.hint("shuffle_hash")
                .select(F.col("id").alias("nbr")),
                "nbr", "left_semi",
            )
        )
        return (
            alive.groupBy("id").agg(F.count(F.lit(1)).alias("core_deg"))
            .where(F.col("core_deg") >= k)
        )

    def removed(old: DataFrame, new: DataFrame) -> float:
        return float(old.count() - new.count())

    runner = SuperstepRunner(
        spark,
        max_iters=max_iters,
        tol=0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "kcore", "k": k, **(config_extra or {}),
                "fixed_iters": max_iters if fixed_iters else None},
    )
    try:
        result = runner.run(
            init, step, metric_fn=None if fixed_iters else removed,
            resume=resume,
        )
    finally:
        canon.unpersist()
    return result
