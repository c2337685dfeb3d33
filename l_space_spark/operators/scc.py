"""Strongly connected components — FW-BW-Trim peeling, min-label variant.

Directed-graph companion to ``components.py`` (which computes WEAKLY
connected components over the symmetric closure). Each outer round over
the still-unassigned subgraph:

1. **Trim**: an active vertex with no active in-edge or no active
   out-edge cannot sit on a directed cycle — it is a singleton SCC.
   Peeling these in bulk is what makes DAG-ish link graphs finish in
   O(longest chain) rounds instead of one SCC per round.
2. **Forward fixpoint**: ``f(v)`` = min active id that can REACH ``v``
   (min-label propagation along edge direction, the directional twin of
   components.neighbor_mins).
3. **Backward fixpoint**: ``b(v)`` = min active id REACHABLE FROM ``v``
   (same propagation along reversed edges).
4. **Peel**: mutual reachability makes both labels constant on an SCC,
   so ``f(v) == b(v) == r`` holds exactly for the members of SCC(``r``)
   (``r`` reaches ``v`` and ``v`` reaches ``r``); assign ``scc = r`` and
   deactivate. The SCC of the minimum active id always satisfies this,
   so every round peels at least one component — with trim, usually far
   more.

The OUTER peel loop runs on the shared ``SuperstepRunner`` (metric =
remaining active vertices, tol 0), so durable checkpoints, resume,
lineage metadata and ``time_limit_s`` behave exactly like the other
iterative algorithms; the inner fixpoints are bounded driver loops with
``localCheckpoint`` per step (the ``Repeat``-as-driver-loop shape,
SURVEY §2.6). Scale shape: every inner superstep shuffles only the
|V_active|-row label table — the per-round active edge slice is
persisted once and reused by both directions, and the labels join it
with ``shuffle_hash`` (same rationale as components.neighbor_mins).

Reference analog: none built in (L-space has no SCC step); the
reference would express one peel round as
``Repeat(out.min ∪ identity) + Repeat(in.min ∪ identity) + Where(f==b)``
(``step/Repeat.scala:100``, ``step/Where.scala``). Algorithm family is
public: Forward-Backward-Trim (Fleischer et al. 2000; Slota et al. 2014
for the bulk-parallel trim formulation); labels here are min-ids rather
than pivot colors so the result is deterministic and oracle-friendly
(``scc`` = min vertex id of the component, matching the CC convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from ..plans.superstep import SuperstepResult, SuperstepRunner


def _propagate_min(
    labels: DataFrame,
    edges: DataFrame,
    from_col: str,
    to_col: str,
    max_iters: int,
) -> DataFrame:
    """Min-label fixpoint over one edge direction.

    ``labels``: ``(id, lab)``; one step sets
    ``lab(v) = min(lab(v), min over (u -> v) of lab(u))`` where the edge
    orientation is ``from_col -> to_col``. Runs until no label changes
    (diameter-bounded) or ``max_iters``.
    """
    labels = labels.localCheckpoint(eager=True).transform(strip_plan_stats)
    for _ in range(max_iters):
        msgs = (
            labels.hint("shuffle_hash")
            .join(edges, labels["id"] == edges[from_col])
            .groupBy(to_col)
            .agg(F.min("lab").alias("nbr_min"))
        )
        new = (
            labels.join(
                msgs.hint("shuffle_hash"),
                labels["id"] == msgs[to_col],
                "left",
            )
            .select(
                labels["id"],
                F.least(
                    F.col("lab"), F.coalesce("nbr_min", F.col("lab"))
                ).alias("lab"),
            )
            .localCheckpoint(eager=True).transform(strip_plan_stats)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.lab") != F.col("o.lab"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_rounds: int = 50,
    inner_max_iters: int = 100,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id long, scc long)``.

    ``scc`` = min vertex id of the strongly connected component (every
    vertex on no directed cycle is its own singleton component).
    ``iterations`` counts OUTER peel rounds; durable checkpoints are
    written at peel-round granularity (the inner fixpoints are
    recomputed on resume — they are deterministic functions of the
    checkpointed assignment state).
    """
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(num_partitions, "src")
        .persist()
    )
    if vertices is None:
        # universe from the UNFILTERED edges: a vertex whose only edges
        # are self-loops is a singleton SCC, not absent (matches the
        # oracle, which builds verts from e0 before dropping self-loops)
        vertices = edges.select(F.col("src").alias("id")).unionByName(
            edges.select(F.col("dst").alias("id"))
        ).distinct()
    else:
        vertices = vertices.select("id").distinct()

    init = vertices.select("id", F.lit(None).cast("long").alias("scc"))

    def step(state: DataFrame, i: int) -> DataFrame:
        done = state.where(F.col("scc").isNotNull())
        active = state.where(F.col("scc").isNull()).select("id")
        e_act = (
            e.join(active.withColumnRenamed("id", "src"), "src", "semi")
            .join(active.withColumnRenamed("id", "dst"), "dst", "semi")
            .repartition(num_partitions, "src")
            .persist()
        )
        e_act.count()

        # 1. trim TO FIXPOINT: a vertex with no surviving in-edge or no
        # surviving out-edge is on no cycle => singleton SCC. Iterating
        # dissolves whole DAG regions in one outer round (each pass is
        # two distinct+semi-join jobs on the shrinking edge slice).
        core = active.localCheckpoint(eager=True).transform(strip_plan_stats)
        e_core = e_act
        n_core = core.count()
        for _ in range(inner_max_iters):
            if n_core == 0:
                break
            has_out = e_core.select("src").distinct()
            has_in = e_core.select("dst").distinct()
            nxt = (
                core.join(
                    has_out.withColumnRenamed("src", "id"), "id", "semi"
                )
                .join(has_in.withColumnRenamed("dst", "id"), "id", "semi")
                .localCheckpoint(eager=True).transform(strip_plan_stats)
            )
            n_nxt = nxt.count()
            if n_nxt == n_core:
                break  # trim fixpoint reached
            # localCheckpoint (NOT bare persist): the next pass derives
            # has_out/has_in AND the following slice from this one, so an
            # un-truncated plan is referenced ~5x per pass and the logical
            # tree grows EXPONENTIALLY in trim depth — a deep trim tail
            # (sparse digraph, E/V ≈ 1.4, ~30 passes) blew a 4 GiB driver
            # on plan strings alone before this truncation
            e_nxt = (
                e_core.join(
                    nxt.withColumnRenamed("id", "src"), "src", "semi"
                )
                .join(nxt.withColumnRenamed("id", "dst"), "dst", "semi")
                .localCheckpoint(eager=True).transform(strip_plan_stats)
            )
            # checkpointed slices have no CacheManager entry to unpersist;
            # rebinding e_core drops the only reference, so each pass's
            # blocks are reclaimed asynchronously by the ContextCleaner —
            # the accepted cost of the plan truncation above (blocks
            # shrink monotonically with the trimmed slice)
            e_core = e_nxt
            core, n_core = nxt, n_nxt
        trimmed = active.join(core, "id", "anti").select(
            "id", F.col("id").alias("scc")
        )

        # 2+3. directional min-label fixpoints over the untrimmed core.
        # Each direction gets a join-key-aligned cache (src- resp.
        # dst-partitioned) so the inner loop's edge side never exchanges
        # — one |E_core| repartition per outer round buys exchange-free
        # joins for every inner iteration (the edgesByTo rationale).
        labels0 = core.select("id", F.col("id").alias("lab"))
        e_fwd = e_core.repartition(num_partitions, "src").persist()
        e_bwd = e_core.repartition(num_partitions, "dst").persist()
        fwd = _propagate_min(labels0, e_fwd, "src", "dst", inner_max_iters)
        bwd = _propagate_min(labels0, e_bwd, "dst", "src", inner_max_iters)

        # 4. peel f == b (provably non-empty when core is non-empty)
        joined = fwd.withColumnRenamed("lab", "f").join(
            bwd.withColumnRenamed("lab", "b"), "id"
        )
        new_state = done.unionByName(trimmed).unionByName(
            joined.select(
                "id",
                F.when(F.col("f") == F.col("b"), F.col("f")).alias("scc"),
            )
        )
        new_state = new_state.localCheckpoint(eager=True).transform(strip_plan_stats)
        e_fwd.unpersist()
        e_bwd.unpersist()
        e_act.unpersist()  # e_core is either e_act or checkpoint-backed
        return new_state

    def remaining(old: DataFrame, new: DataFrame) -> float:
        return float(new.where(F.col("scc").isNull()).count())

    runner = SuperstepRunner(
        spark,
        max_iters=max_rounds,
        tol=0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "scc", **(config_extra or {})},
    )
    try:
        result = runner.run(init, step, metric_fn=remaining, resume=resume)
    finally:
        e.unpersist()
    return result
