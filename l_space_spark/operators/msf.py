"""Minimum spanning forest — distributed Borůvka on the superstep runner.

Reference analog: none built in (L-space ships no algorithms); a user would
express the per-round "cheapest incident edge" as ``group → min`` over an
``outE/inE`` move (``step/Group.scala``, ``step/Min.scala``) and the
contraction as repeated ``Repeat`` — this module is the scale-correct Spark
formulation of that loop.

Algorithm (classic distributed Borůvka, e.g. Lattanzi et al., "Filtering: a
method for solving graph problems in MapReduce", SPAA'11 §4):

* State = the CONTRACTED edge multigraph, one row per surviving edge:
  ``(u, v, w, cu, cv, done)`` — ``u, v, w`` the original canonical endpoints
  and weight (immutable edge identity), ``cu, cv`` the current component
  labels of its endpoints, ``done`` marks rows frozen into the forest.
* Each superstep: every component picks its minimum incident edge under the
  TOTAL order ``(w, u, v)`` (ties are impossible — the suffix makes the key
  unique per edge, so the forest is unique and deterministic); the picked
  edges are frozen ``done``; the "conjoined trees" they induce are collapsed
  by pointer doubling (with distinct weights the pointer graph's only cycles
  are mutual-minimum 2-cycles — the classic Borůvka fact); surviving edges
  are relabeled, intra-component rows dropped, and parallel contracted edges
  deduplicated keeping the minimum key (cycle property: a non-minimal edge
  between the same component pair can never enter the forest).

Scale shape: components at least halve per round → ≤ log2(V) supersteps;
each superstep is two combiner-backed groupBys + three equi-joins over the
SHRINKING contracted edge set, plus O(log #components) tiny pointer-doubling
jobs on a ≤ #components-row table. No |V|-row state is ever maintained — the
contracted edge table IS the state, so checkpoint/resume (north rule) covers
the forest and the remaining work in one parquet. Total work O(|E| log V),
the textbook bound.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from ..plans.superstep import SuperstepResult, SuperstepRunner


def _canonical(edges: DataFrame, weight_col: str) -> DataFrame:
    """Distinct canonical undirected weighted edges (u < v), self-loops
    dropped; per pair keep the minimum weight (parallel inputs collapse)."""
    e = edges.select(
        F.least("src", "dst").alias("u"),
        F.greatest("src", "dst").alias("v"),
        F.col(weight_col).alias("w"),
    ).where(F.col("u") != F.col("v"))
    return e.groupBy("u", "v").agg(F.min("w").alias("w"))


def _key() -> F.Column:
    """The total edge order: (w, u, v) — unique per canonical edge."""
    return F.struct(F.col("w"), F.col("u"), F.col("v"))


def _collapse_roots(par: DataFrame, n_components: int) -> DataFrame:
    """Resolve the per-round pointer graph ``(c, par)`` to roots.

    The pointers follow each component's minimum incident edge, so weights
    strictly decrease along every chain until a mutual-minimum pair — break
    those 2-cycles (smaller label becomes root), then pointer-double a fixed
    ⌈log2(n)⌉ times (chain depth ≤ n, halves per doubling). Each doubling is
    a self-join on the ≤ n_components-row table, localCheckpointed to keep
    the plan flat (a naive p⋈p recursion doubles the plan tree per round —
    the SCC trim-loop lesson)."""
    a, b = par.alias("a"), par.alias("b")
    par = (
        a.join(b, F.col("a.par") == F.col("b.c"))
        .select(
            F.col("a.c").alias("c"),
            F.when(
                (F.col("b.par") == F.col("a.c"))
                & (F.col("a.c") < F.col("a.par")),
                F.col("a.c"),
            ).otherwise(F.col("a.par")).alias("par"),
        )
    )
    for _ in range(max(1, math.ceil(math.log2(max(2, n_components))))):
        par = par.localCheckpoint(eager=True).transform(strip_plan_stats)
        a, b = par.alias("a"), par.alias("b")
        par = a.join(b, F.col("a.par") == F.col("b.c")).select(
            F.col("a.c").alias("c"), F.col("b.par").alias("par")
        )
    return par


def minimum_spanning_forest(
    spark: SparkSession,
    edges: DataFrame,
    weight_col: str = "w",
    max_rounds: int = 40,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Borůvka MSF of the undirected graph ``edges(src, dst, weight_col)``.

    Returns a SuperstepResult whose state has schema
    ``(u long, v long, w, cu, cv, done boolean)``; the forest is the
    ``done`` rows' ``(u, v, w)`` — unique under the (w, u, v) total order,
    |forest| = V − #components. Convergence: zero active cross-component
    edges remain (``tol=0``)."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    base = _canonical(edges, weight_col).repartition(num_partitions, "u")
    init = base.select(
        "u", "v", "w",
        F.col("u").alias("cu"), F.col("v").alias("cv"),
        F.lit(False).alias("done"),
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        frozen = state.where(F.col("done"))
        active = state.where(~F.col("done") & (F.col("cu") != F.col("cv")))
        payload = F.struct(
            _key().alias("k"), F.col("u"), F.col("v"), F.col("w"),
            F.col("cu"), F.col("cv"),
        ).alias("m")
        cand = active.select(F.col("cu").alias("c"), payload).unionByName(
            active.select(F.col("cv").alias("c"), payload)
        )
        # persist (NOT localCheckpoint): a checkpointed sel becomes a
        # stats-less LogicalRDD and the downstream relabel joins fall off
        # the broadcast/AQE path — measured at sf0.01-sparse: rounds went
        # from ~3 s to minutes. The persist is released after the new
        # state is materialized below, so nothing recomputes or leaks.
        sel = cand.groupBy("c").agg(F.min("m").alias("m")).persist()
        n_comp = sel.count()  # aux scalar: sizes the fixed doubling count
        if n_comp == 0:
            sel.unpersist()
            return frozen

        chosen = sel.select(
            F.col("m.u").alias("u"), F.col("m.v").alias("v"),
            F.col("m.w").alias("w"), F.col("m.cu").alias("cu"),
            F.col("m.cv").alias("cv"), F.lit(True).alias("done"),
        ).distinct()

        par = sel.select(
            "c",
            F.when(F.col("m.cu") == F.col("c"), F.col("m.cv"))
            .otherwise(F.col("m.cu")).alias("par"),
        )
        roots = _collapse_roots(par, n_comp)

        # roots is ≤ #components rows — can be |V|-sized in round 1, so no
        # forced broadcast: shuffled hash join (AQE upgrades it to broadcast
        # once the component count collapses), same rationale as pagerank
        mu = roots.select(F.col("c").alias("cu"), F.col("par").alias("ru"))
        mv = roots.select(F.col("c").alias("cv"), F.col("par").alias("rv"))
        relabeled = (
            active.join(mu.hint("shuffle_hash"), "cu", "left")
            .join(mv.hint("shuffle_hash"), "cv", "left")
            .select(
                "u", "v", "w",
                F.coalesce("ru", F.col("cu")).alias("cu"),
                F.coalesce("rv", F.col("cv")).alias("cv"),
            )
            .where(F.col("cu") != F.col("cv"))
        )
        # dedupe parallel contracted edges: only the minimum-key edge
        # between a component pair can ever join the forest (cycle property)
        survivors = (
            relabeled.groupBy(
                F.least("cu", "cv").alias("pu"),
                F.greatest("cu", "cv").alias("pv"),
            )
            .agg(F.min(F.struct(_key().alias("k"), "u", "v", "w", "cu",
                                "cv")).alias("m"))
            .select(
                F.col("m.u").alias("u"), F.col("m.v").alias("v"),
                F.col("m.w").alias("w"), F.col("m.cu").alias("cu"),
                F.col("m.cv").alias("cv"), F.lit(False).alias("done"),
            )
        )
        # materialize BEFORE releasing sel (the runner's own checkpoint
        # of an already-cached frame is a cheap cached scan)
        out = frozen.unionByName(chosen).unionByName(survivors) \
            .localCheckpoint(eager=True).transform(strip_plan_stats)
        sel.unpersist()
        return out

    def active_left(old: DataFrame, new: DataFrame) -> float:
        return float(new.where(~F.col("done")).count())

    runner = SuperstepRunner(
        spark,
        max_iters=max_rounds,
        tol=0.0,
        checkpoint_dir=checkpoint_dir,
        # weight_col defines the forest: pin it so resume against a
        # checkpoint computed under a different weight column is refused
        config={"algo": "msf_boruvka", "weight_col": weight_col,
                **(config_extra or {})},
    )
    return runner.run(init, step, metric_fn=active_left, resume=resume)


def forest_edges(result: SuperstepResult) -> DataFrame:
    """The MSF edge list ``(u, v, w)`` from a finished run."""
    return result.state.where(F.col("done")).select("u", "v", "w")
