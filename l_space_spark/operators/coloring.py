"""Greedy graph coloring — Jones–Plassmann with deterministic hash
priorities.

The distributed classic (Jones & Plassmann 1993): every vertex draws a
static random priority — here the portable 60-bit hash of
``(seed, id)``, so runs are deterministic and SQL-replayable — and
colors itself in the round where no UNCOLORED neighbor outranks it,
taking the smallest color absent from its already-colored neighborhood
(the mex). Adjacent vertices therefore never pick conflicting colors:
the lower-priority one waits and sees the higher one's color. Rounds =
longest priority-decreasing path (O(log n / log log n) w.h.p. on
bounded-degree graphs; dense graphs serialize — the documented trade,
run more rounds). A 60-bit priority collision between neighbors
deadlocks those two vertices identically in both engines (same stance
as the MIS operator: ~n²/2⁶⁰, not tie-broken, oracle contract intact).

Scale shape per round: one message pass for the max uncolored-neighbor
priority (map-side-combinable ``max``) and one ``collect_set`` of
colored-neighbor colors — the collected set is bounded by degree, and
the mex is a pure Catalyst array expression (``array_min ∘ filter ∘
sequence``), no UDF. The symmetric closure is persisted src-partitioned
once; only |V|-row tables shuffle per round. SuperstepRunner gives
checkpoints/resume (metric = uncolored count, tol 0).

Reference analog: none; with MIS this completes the
scheduling-primitive pair the reference's interpreter cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from ..functions.text import hash60
from ..plans.superstep import SuperstepResult, SuperstepRunner
from .components import undirect


def _mex(colors: F.Column) -> F.Column:
    """Smallest non-negative int absent from an int-array column (the
    array need not be sorted or distinct)."""
    return F.array_min(
        F.filter(
            F.sequence(F.lit(0), F.size(colors)),
            lambda x: ~F.array_contains(colors, x),
        )
    )


def greedy_coloring(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 30,
    seed: str = "col",
    fixed_iters: bool = False,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id long, color int)`` —
    a proper coloring (NULL color only if ``max_rounds`` was too small
    for the graph's priority-path depth; ``fixed_iters=True`` runs
    exactly ``max_rounds`` rounds so an unrolled oracle can replay the
    run, leftover NULLs and all)."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    und = undirect(edges).repartition(num_partitions, "src").persist()
    all_ids = edges.select(F.col("src").alias("id")).unionByName(
        edges.select(F.col("dst").alias("id"))
    ).distinct()
    init = all_ids.select("id", F.lit(None).cast("int").alias("color"))

    def pr(col: F.Column) -> F.Column:
        return hash60(
            F.concat_ws(":", F.lit(seed), col.cast("string"))
        )

    def step(state: DataFrame, i: int) -> DataFrame:
        unc = state.where(F.col("color").isNull()).select(
            "id", pr(F.col("id")).alias("p")
        ).localCheckpoint(eager=True).transform(strip_plan_stats)
        # pass 1: max uncolored-neighbor priority → readiness
        nbr_max = (
            unc.hint("shuffle_hash")
            .join(und, unc["id"] == und["src"])
            .groupBy("dst")
            .agg(F.max("p").alias("mp"))
        )
        ready = (
            unc.join(nbr_max.hint("shuffle_hash"),
                     unc["id"] == nbr_max["dst"], "left")
            .where(F.col("mp").isNull() | (F.col("mp") < F.col("p")))
            .select(unc["id"])
        )
        # pass 2: colored-neighbor colors → mex
        colored = state.where(F.col("color").isNotNull())
        palette = (
            colored.hint("shuffle_hash")
            .join(und, colored["id"] == und["src"])
            .groupBy("dst")
            .agg(F.collect_set("color").alias("cols"))
        )
        newly = (
            ready.join(palette, ready["id"] == palette["dst"], "left")
            .select(
                ready["id"],
                _mex(
                    F.coalesce("cols", F.array().cast("array<int>"))
                ).cast("int").alias("new_color"),
            )
        )
        return (
            state.join(newly, "id", "left")
            .select(
                "id",
                F.coalesce("color", "new_color").alias("color"),
            )
        )

    def uncolored(old: DataFrame, new: DataFrame) -> float:
        return float(new.where(F.col("color").isNull()).count())

    runner = SuperstepRunner(
        spark,
        max_iters=max_rounds,
        tol=-1.0 if fixed_iters else 0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "coloring", "seed": seed,
                **(config_extra or {})},
    )
    try:
        result = runner.run(
            init, step, metric_fn=None if fixed_iters else uncolored,
            resume=resume,
        )
    finally:
        und.unpersist()
    return result
