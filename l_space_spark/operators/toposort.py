"""DAG layering — longest-path topological levels ("build order").

For a DAG, ``level(v) = length of the longest directed path ending at
v`` (sources sit at level 0). Levels are the canonical parallel
schedule of a dependency graph: everything at level k can build
concurrently once levels < k are done. On a repo→repo import/dependency
link graph this is THE question the graph answers — composed with SCC
condensation (``operators/scc.py``) it handles cyclic dependency knots
too: contract each SCC to one node, layer the (acyclic-by-construction)
condensation, and every repo inherits its component's build stage. That
composition ships as the ``build_order_levels`` catalog entry.

Algorithm: synchronous Bellman relaxation of the longest-path
recurrence, one superstep per round::

    l_{k+1}(v) = coalesce(max over in-edges (u, v) of l_k(u) + 1, 0)

Starting from all-zero this is pointwise monotone nondecreasing (by
induction: if ``l_k ≥ l_{k-1}`` everywhere then each max can only
grow), and on a DAG it reaches the exact longest-path level of every
vertex in ≤ depth(G) rounds, then stays fixed — so ``fixed_iters``
rounds past convergence are no-ops and the unrolled-CTE oracle compares
exactly (the engine-wide oracle-comparable contract, same as kcore).

Input MUST be acyclic for the fixpoint to exist: on a cycle the
recurrence grows forever. Callers with possibly-cyclic input run SCC
first and layer the condensation (as ``build_order_levels`` does); in
metric mode a non-DAG simply exhausts ``max_iters`` and returns
``converged=False`` — a cheap cycle detector, never an infinite loop.

Scale shape: the per-round join is ``state ⋈ links ON src`` followed by
a combiner-backed ``max`` groupBy on ``dst`` — so the |E|-row link
cache is hashed ONCE by ``src`` and persisted, and every superstep
shuffles only the |V|-row level table (the components/pagerank
discipline; ``shuffle_hash`` hints keep Catalyst from sort-merge
re-exchanging the cached side).

Reference analog: none — the reference has no topological step; its
closest idiom is ``Repeat(in(), until-empty)`` with client-side depth
counting (``core/.../step/Repeat.scala:100``). This is the
barrier-aggregated form with exact longest-path semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepResult, SuperstepRunner


def _level_step(links: DataFrame, verts: DataFrame):
    """The per-round relaxation, factored out so tests can pin its
    physical plan directly (the post-run state is a checkpoint leaf
    whose plan shows nothing): ``links`` and ``verts`` must arrive
    cached and hash-partitioned on ``src`` resp. ``id``."""

    def step(state: DataFrame, i: int) -> DataFrame:
        msgs = (
            links.join(
                state.hint("shuffle_hash")
                .select(F.col("id").alias("src"), "level"),
                "src",
            )
            .groupBy("dst")
            .agg((F.max("level") + F.lit(1)).alias("lv"))
            .select(F.col("dst").alias("id"), "lv")
        )
        return verts.join(msgs.hint("shuffle_hash"), "id", "left").select(
            "id", F.coalesce("lv", F.lit(0)).cast("long").alias("level")
        )

    return step


def _total_level(df: DataFrame) -> int:
    return df.agg(
        F.coalesce(F.sum("level"), F.lit(0)).alias("t")
    ).collect()[0]["t"]


def dag_levels(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 64,
    fixed_iters: bool = False,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
    materialize_every: int = 1,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id long, level long)`` —
    the longest-path level of every vertex of the DAG ``edges``
    (``(src, dst)`` = src must come before dst). ``vertices`` widens the
    universe beyond edge endpoints (isolated vertices sit at level 0);
    ``fixed_iters`` runs exactly ``max_iters`` relaxations (the
    oracle-comparable mode)."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    links = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(num_partitions, "src")
        .persist()
    )
    if vertices is None:
        vertices = edges.select(F.col("src").alias("id")).unionByName(
            edges.select(F.col("dst").alias("id"))
        ).distinct()
    else:
        vertices = vertices.select("id").distinct()
    verts = vertices.repartition(num_partitions, "id").persist()

    init = verts.select("id", F.lit(0).cast("long").alias("level"))

    step = _level_step(links, verts)
    memo: dict = {"total": None}

    def raised(old: DataFrame, new: DataFrame) -> float:
        # levels are pointwise monotone nondecreasing, so the total-level
        # delta is 0 iff NO level changed — two scalar aggregates per
        # round instead of a |V|⋈|V| comparison join (the 1M-vertex probe
        # measured the join metric at ~2× the superstep itself). Σlevel ≤
        # |V|·depth ≤ |V|² stays far inside BIGINT at any realistic scale.
        # One-slot memo: old's total IS last round's new total — seed it
        # lazily (resume can start mid-run) and carry it forward, halving
        # the metric jobs.
        if memo["total"] is None:
            memo["total"] = _total_level(old)
        new_total = _total_level(new)
        delta = float(new_total - memo["total"])
        memo["total"] = new_total
        return delta

    runner = SuperstepRunner(
        spark,
        max_iters=max_iters,
        tol=0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "dag_levels", **(config_extra or {}),
                "fixed_iters": max_iters if fixed_iters else None},
        # the step is fully lazy (joins + groupBy, no driver reads), so
        # fixed-iteration runs may fuse k rounds per materialization
        materialize_every=materialize_every,
    )
    try:
        result = runner.run(
            init, step, metric_fn=None if fixed_iters else raised,
            resume=resume,
        )
    finally:
        links.unpersist()
        verts.unpersist()
    return result
