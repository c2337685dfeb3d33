"""k-truss decomposition — synchronous edge peeling by triangle support.

The k-truss is the maximal subgraph in which every edge closes at least
``k − 2`` triangles (Cohen 2008) — the standard dense-community core
that k-core over-approximates (a k-core vertex needs k neighbors; a
k-truss edge needs k−2 TRIANGULATED neighbors, a much stronger cohesion
signal for link-farm / community mining). Synchronous peeling:
recompute every surviving edge's support, drop all edges below
``k − 2``, repeat to a fixpoint — exactly the kcore entry's fixed-round
discipline, so the unrolled SQL oracle replays each round.

Per round the support count routes through the degree-ordered oriented
wedge join (``triangles._triangles_of`` over a per-round persisted
orientation — it appears three times in the plan, so it is packed once;
per-vertex fan-out bounded O(√E), the module's skew story) then one
explode(3)+count per triangle. Triangle SETS are orientation-independent, so the oracle may
use the naive ``b < c`` wedge form and still match exactly. State on
the SuperstepRunner is the EDGE table (the runner is state-schema
agnostic): metric = edges removed, tol 0, durable checkpoints/resume at
round granularity.

Reference analog: none (the reference cannot express triangle queries
at all, SURVEY §2.2); k-truss + k-core + clustering coefficient
complete the cohesion family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from ..plans.superstep import SuperstepResult, SuperstepRunner
from .triangles import _canonical, _oriented, _triangles_of


def edge_support(canon: DataFrame,
                 oriented: DataFrame | None = None) -> DataFrame:
    """(a, b, support) for every canonical edge: the number of triangles
    the edge participates in (0-support edges included). Pass a
    pre-persisted ``oriented`` table when materializing the result —
    the oriented frame appears three times in the plan (two wedge sides
    + closing edges), so an unpersisted one recomputes canonicalize +
    degree-join 3×."""
    if oriented is None:
        oriented = _oriented(
            canon.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        )
    tri = _triangles_of(oriented)
    sides = (
        tri.select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .unionByName(tri.select(F.least("x", "z").alias("a"),
                                F.greatest("x", "z").alias("b")))
        .unionByName(tri.select(F.least("y", "z").alias("a"),
                                F.greatest("y", "z").alias("b")))
    )
    counts = sides.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))
    return canon.join(counts, ["a", "b"], "left").select(
        "a", "b", F.coalesce("support", F.lit(0)).alias("support")
    )


def ktruss(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 4,
    max_rounds: int = 30,
    fixed_iters: bool = False,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Returns SuperstepResult whose state ``(a long, b long)`` is the
    canonical edge set of the k-truss (maximal subgraph with every edge
    in ≥ k−2 triangles). ``fixed_iters=True`` runs exactly
    ``max_rounds`` rounds (rounds past the fixpoint are no-ops) so an
    unrolled oracle can replay the run."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3")
    init = _canonical(edges)

    def step(state: DataFrame, i: int) -> DataFrame:
        o = _oriented(
            state.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        ).persist()
        new = (
            edge_support(state, oriented=o)
            .where(F.col("support") >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=True).transform(strip_plan_stats)
        )
        o.unpersist()
        return new

    def removed(old: DataFrame, new: DataFrame) -> float:
        return float(old.count() - new.count())

    runner = SuperstepRunner(
        spark,
        max_iters=max_rounds,
        tol=-1.0 if fixed_iters else 0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "ktruss", "k": k, **(config_extra or {})},
    )
    return runner.run(
        init, step, metric_fn=None if fixed_iters else removed,
        resume=resume,
    )
