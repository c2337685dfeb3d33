"""Weisfeiler-Lehman color refinement — structural vertex fingerprints.

The 1-WL vertex refinement (Weisfeiler & Lehman 1968; the standard
structural feature for graph ML and the classic symmetry/equivalence
detector): start from the degree, then repeatedly recolor every vertex
by hashing its own color together with the MULTISET of its neighbors'
colors. Two vertices keep equal colors exactly as long as their rooted
neighborhood trees agree; the color-class partition refines monotonically
and is stable once a round splits no class.

Multiset encoding, scale-shaped: the textbook form sorts each vertex's
neighbor-color list (``collect_list`` + sort — a power-law hub's whole
inbox in one task, the exact shape the coreness VERDICT flagged).
Instead the multiset is encoded ADDITIVELY: each neighbor contributes
``hash60(color) mod 10^9`` and the groupBy takes ``(sum, count)`` —
order-invariant, exact integer arithmetic (sum < 10^9·|V| stays inside
BIGINT through |V| ~ 10^9), and combiner-backed, so the per-round plan
is the same |V|-row-shuffle superstep as PageRank: the |E| closure is
hashed ONCE by ``src`` and every round shuffles only the color table.
Additive multiset hashing is the standard scalable-WL trade (a hash
collision can merge two classes; with 60-bit recolor hashes and 30-bit
summands the probability is negligible at any tested scale, and the
refinement remains deterministic and cross-engine exact).

Convergence: the class COUNT is nondecreasing and the partition is
stable iff a round adds no class, so metric = new_classes − old_classes
with tol 0 (color VALUES keep changing under rehash; the partition is
what stabilizes). ``fixed_iters`` runs exactly ``max_iters`` rounds —
the oracle-comparable mode (unrolled-CTE DuckDB twin, exact equality).

Reference analog: none — the reference has no structural-equivalence
machinery; its nearest idiom is repeated ``out()`` moves with
client-side grouping (``core/.../step/Out.scala``). This is the
barrier-aggregated fixpoint form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash60
from ..plans.superstep import SuperstepResult, SuperstepRunner
from .components import undirect

SUMMAND_MOD = 1_000_000_000


def _recolor_step(links: DataFrame):
    """Per-round recolor, factored out for plan pinning: ``links`` must
    arrive as the symmetric closure, cached and hash-partitioned on
    ``src``."""

    def step(state: DataFrame, i: int) -> DataFrame:
        msgs = (
            links.join(
                state.hint("shuffle_hash")
                .select(F.col("id").alias("src"), "color"),
                "src",
            )
            .groupBy("dst")
            .agg(
                F.sum(
                    F.pmod(hash60(F.col("color").cast("string")),
                           F.lit(SUMMAND_MOD))
                ).alias("s"),
                F.count(F.lit(1)).alias("c"),
            )
            .select(F.col("dst").alias("id"), "s", "c")
        )
        # inner join: every closure vertex has degree >= 1, so every
        # vertex receives at least one message every round
        return state.join(msgs.hint("shuffle_hash"), "id").select(
            "id",
            hash60(
                F.concat_ws(
                    ":",
                    F.col("color").cast("string"),
                    F.col("s").cast("string"),
                    F.col("c").cast("string"),
                )
            ).alias("color"),
        )

    return step


def wl_refinement(
    spark: SparkSession,
    edges: DataFrame,
    max_iters: int = 16,
    fixed_iters: bool = False,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
    materialize_every: int = 1,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id long, color long)`` —
    the 1-WL color of every non-isolated vertex of the undirected
    simple graph after refinement (init = degree). In metric mode the
    run stops one round after the class partition stops splitting;
    ``fixed_iters`` runs exactly ``max_iters`` rounds (the
    oracle-comparable mode)."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    links = (
        undirect(edges)
        .repartition(num_partitions, "src")
        .persist()
    )
    init = (
        links.groupBy("src")
        .agg(F.count(F.lit(1)).alias("color"))
        .select(F.col("src").alias("id"), F.col("color").cast("long"))
        .repartition(num_partitions, "id")
    )

    step = _recolor_step(links)
    memo: dict = {"classes": None}

    def new_splits(old: DataFrame, new: DataFrame) -> float:
        # class count is nondecreasing under refinement; stable (and
        # provably fixed from then on) iff a round adds no class
        if memo["classes"] is None:
            memo["classes"] = old.select("color").distinct().count()
        n = new.select("color").distinct().count()
        delta = float(n - memo["classes"])
        memo["classes"] = n
        return delta

    runner = SuperstepRunner(
        spark,
        max_iters=max_iters,
        tol=0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "wl", **(config_extra or {}),
                "fixed_iters": max_iters if fixed_iters else None},
        materialize_every=materialize_every,
    )
    try:
        result = runner.run(
            init, step, metric_fn=None if fixed_iters else new_splits,
            resume=resume,
        )
    finally:
        links.unpersist()
    return result
