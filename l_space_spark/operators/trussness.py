"""Trussness (truss-number) decomposition — local h-index dynamics on
the triangle incidence structure.

``ktruss.py`` answers "which edges survive the K-truss?" for ONE k;
this operator computes every edge's truss number τ(e) (the largest k
with e ∈ k-truss) at once — the edge analog of ``coreness.py``, via the
same local-convergence principle (Sariyüce, Seshadhri & Pinar, WWW'18
nucleus decomposition): start from ``s₀(e) = support(e)`` and repeat

    s_{t+1}(e) = min(s_t(e), H({ min(s_t(f), s_t(g))
                                 : triangle {e, f, g} }))

where ``H`` is the h-index over e's triangles. The sequence is
non-increasing and converges exactly to ``τ(e) − 2``. No peeling order,
no global state — a perfect superstep.

Scale shape: the TRIANGLE LIST IS STATIC — computed once by the
degree-ordered oriented wedge join (O(√E) fan-out bound) and persisted;
each round is three equi-joins of the |E|-row value table against it
(one per corner edge), a 3-way explode into per-(edge, triangle)
messages, and the same histogram/count h-index kernel as coreness
(``hindex.h_index_by`` — combiner-backed counts, no per-inbox sort).
Only value tables move per round. Fixed-round mode replays for the
unrolled SQL oracle (kcore/ktruss/coreness discipline).

Reference analog: none; coreness (vertex) + trussness (edge) give the
full density hierarchy the fixed-k entries only sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from ..plans.superstep import SuperstepResult, SuperstepRunner
from .hindex import h_index_by
from .ktruss import edge_support
from .triangles import _canonical, _oriented, _triangles_of


def trussness(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 30,
    fixed_iters: bool = False,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(a long, b long, t long)``
    over canonical edges, where ``t = τ(e) − 2`` (so the truss number
    is ``t + 2``; triangle-free edges have t = 0, τ = 2)."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    canon = _canonical(edges).persist()
    o = _oriented(
        canon.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    ).persist()
    # static triangle triples with x < y < z canonical corner edges
    tri = _triangles_of(o).select(
        F.least("x", "y").alias("xy_a"), F.greatest("x", "y").alias("xy_b"),
        F.least("x", "z").alias("xz_a"), F.greatest("x", "z").alias("xz_b"),
        F.least("y", "z").alias("yz_a"), F.greatest("y", "z").alias("yz_b"),
    ).persist()
    tri.count()

    init = edge_support(canon, oriented=o).select(
        "a", "b", F.col("support").cast("long").alias("t")
    )
    o.unpersist()

    def step(state: DataFrame, i: int) -> DataFrame:
        v = state.localCheckpoint(eager=True).transform(strip_plan_stats)

        def side(pa: str, pb: str, alias: str) -> DataFrame:
            return v.select(
                F.col("a").alias(pa), F.col("b").alias(pb),
                F.col("t").alias(alias),
            )

        joined = (
            tri.join(side("xy_a", "xy_b", "vxy"), ["xy_a", "xy_b"])
            .join(side("xz_a", "xz_b", "vxz"), ["xz_a", "xz_b"])
            .join(side("yz_a", "yz_b", "vyz"), ["yz_a", "yz_b"])
        )
        msgs = (
            joined.select(F.col("xy_a").alias("a"), F.col("xy_b").alias("b"),
                          F.least("vxz", "vyz").alias("mv"))
            .unionByName(joined.select(
                F.col("xz_a").alias("a"), F.col("xz_b").alias("b"),
                F.least("vxy", "vyz").alias("mv")))
            .unionByName(joined.select(
                F.col("yz_a").alias("a"), F.col("yz_b").alias("b"),
                F.least("vxy", "vxz").alias("mv")))
        )
        h = h_index_by(msgs, ["a", "b"], "mv", out="h")
        return v.join(h, ["a", "b"], "left").select(
            "a", "b",
            F.least(F.col("t"), F.coalesce("h", F.lit(0))).alias("t"),
        )

    def changed(old: DataFrame, new: DataFrame) -> float:
        return float(
            new.alias("n").join(old.alias("o"), ["a", "b"])
            .where(F.col("n.t") != F.col("o.t")).count()
        )

    runner = SuperstepRunner(
        spark,
        max_iters=max_rounds,
        tol=-1.0 if fixed_iters else 0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "trussness", **(config_extra or {})},
    )
    try:
        result = runner.run(
            init, step, metric_fn=None if fixed_iters else changed,
            resume=resume,
        )
    finally:
        tri.unpersist()
        canon.unpersist()
    return result
