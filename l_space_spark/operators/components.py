"""Connected components — hash-min label broadcast over the undirected graph.

State: ``(id, component)`` initialized to ``component = id``. Each superstep
every vertex adopts the minimum component id among itself and its neighbors
(both edge directions); convergence when no vertex changes. O(diameter)
supersteps — fine for social/link graphs (small diameter); for
long-diameter graphs use `connected_components_star` below (large-star/
small-star contraction, O(log n) rounds, identical output schema).

Reference analog: none built in; L-space would express this as
``Repeat(out/in ∪ identity → min)`` (``step/Repeat.scala:100``).
Result matches the recursive-CTE min-reachability oracle exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepRunner, SuperstepResult


def undirect(edges: DataFrame) -> DataFrame:
    """Distinct symmetric closure (both directions), self-loops dropped."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


_EMPTY_MINS = pa.table(
    {"dst": pa.array([], pa.int64()), "nbr_min": pa.array([], pa.int64())}
)


def _csr_min_kernel(stbl: pa.Table, btbl: pa.Table) -> pa.Table:
    """Per-block partial min of neighbor components: the PageRank gather/
    reduceat kernel with ``minimum`` instead of ``add`` (same CSR buffers,
    weights unused). Arrow in/out — zero-copy views, no pandas (see
    pagerank._csr_kernel)."""
    from .pagerank import align_to_srcs, pa_buf, pa_col

    if btbl.num_rows == 0 or stbl.num_rows == 0:
        return _EMPTY_MINS
    srcs = pa_buf(btbl, "srcs", np.int64)
    if len(srcs) == 0:
        return _EMPTY_MINS
    eidx = pa_buf(btbl, "eidx", np.int64)
    dstu = pa_buf(btbl, "dstu", np.int64)
    segs = pa_buf(btbl, "segs", np.int64)
    comp = align_to_srcs(
        srcs,
        pa_col(stbl, "id"),
        pa_col(stbl, "component"),
        np.iinfo(np.int64).max,  # src without state → neutral for min
    )
    return pa.table(
        {"dst": pa.array(dstu),
         "nbr_min": pa.array(np.minimum.reduceat(comp[eidx], segs))}
    )


def neighbor_mins(state: DataFrame, und: DataFrame) -> DataFrame:
    """One superstep's messages: per-vertex min of neighbor components.

    shuffle_hash hint (same rationale as pagerank): broadcasting the
    |V|-row state every round serializes on the driver, and the SMJ
    alternative re-sorts the |E|-row und cache every round; a shuffled
    hash join moves only the state and reuses und's src partitioning —
    which, when ``und`` is a src-bucketed ``write_symmetric_edges`` table,
    means the edge side needs NO exchange at all (plan-pinned in
    tests/test_plans.py)."""
    return (
        state.hint("shuffle_hash").join(und, state["id"] == und["src"])
        .groupBy("dst")
        .agg(F.min("component").alias("nbr_min"))
    )


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 100,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    impl: str = "dataframe",
    sym_edges: DataFrame | None = None,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id long, component long)``.

    ``component`` = min vertex id of the (weakly) connected component.

    ``impl="csr"``: the vectorized-kernel path — identical superstep
    structure, but neighbor minima come from the persisted packed CSR
    blocks (pagerank.pack_csr_blocks; weights ignored) via a cogroup +
    ``np.minimum.reduceat`` instead of the join+groupBy. Same crossover
    economics as PageRank's csr path (wins on dense graphs, see
    pagerank.py module doc); output is exactly equal either way (min is
    order-independent — no fp concerns at all here).

    ``sym_edges``: a pre-materialized distinct symmetric closure (e.g. a
    src-bucketed table written once by ``sources.write_symmetric_edges``)
    — replaces the query-time ``undirect`` + repartition, so the per-round
    neighbor join reads the edge side with no exchange at all. ``edges``
    is ignored for the closure when given; the caller owns the contract
    that it IS the closure of the graph being queried.
    """
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    und = (
        sym_edges.select("src", "dst")
        if sym_edges is not None
        else undirect(edges).repartition(num_partitions, "src")
    ).persist()
    if vertices is None:
        vertices = und.select(F.col("src").alias("id")).distinct()
    else:
        vertices = vertices.select("id").distinct()
    vertices = vertices.persist()

    init = vertices.select("id", F.col("id").alias("component"))

    csr_blocks: DataFrame | None = None
    if impl == "csr":
        from .pagerank import pack_csr_blocks

        csr_blocks = pack_csr_blocks(
            und.withColumn("w", F.lit(1.0)), num_partitions
        ).persist()
        csr_blocks.count()  # pack once, before the superstep clock starts

    def step(state: DataFrame, i: int) -> DataFrame:
        if impl == "csr":
            p = F.lit(num_partitions)
            s = state.withColumn(
                "block", F.pmod(F.xxhash64("id"), p).cast("int")
            )
            partial = s.groupBy("block").cogroup(
                csr_blocks.groupBy("block")
            ).applyInArrow(_csr_min_kernel, schema="dst long, nbr_min long")
            msgs = partial.groupBy("dst").agg(
                F.min("nbr_min").alias("nbr_min")
            )
        else:
            msgs = neighbor_mins(state, und)
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
        config={"algo": "connected_components", "impl": impl,
                **(config_extra or {})},
    )
    try:
        result = runner.run(init, step, metric_fn=changed_count, resume=resume)
    finally:
        und.unpersist()
        vertices.unpersist()
        if csr_blocks is not None:
            csr_blocks.unpersist()
    return result


def _nbrs(e: DataFrame) -> DataFrame:
    return e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def connected_components_star(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 50,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Connected components via alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — O(log n) rounds instead of hash-min's O(diameter), the
    scale path for long-diameter graphs (measured: a 4096-vertex path
    graph converges in 13 supersteps — 11 at 1024 — where hash-min needs
    ~n/2 rounds).

    State = the evolving edge set ``(u, v)``; each superstep applies
    large-star (hook every neighbor > u to u's neighborhood minimum) then
    small-star (hook the rest), each a groupBy(min) + join — two shuffles
    per round over a shrinking edge set. Convergence: the canonical edge
    set stops changing. Result schema matches `connected_components`:
    ``(id, component)``, component = min vertex id.
    """
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    base = (
        edges.select(F.least("src", "dst").alias("u"),
                     F.greatest("src", "dst").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .repartition(num_partitions, "u")
    )
    if vertices is None:
        all_verts = base.select(F.col("u").alias("id")).unionByName(
            base.select(F.col("v").alias("id"))
        ).distinct()
    else:
        all_verts = vertices.select("id").distinct()
    all_verts = all_verts.persist()

    def star(e: DataFrame, large: bool) -> DataFrame:
        nb = _nbrs(e)
        m = nb.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        j = nb.hint("shuffle_hash").join(m, "u")
        keep = F.col("v") > F.col("u") if large else F.col("v") <= F.col("u")
        hooked = j.where(keep).select(
            F.least(F.col("v"), F.col("m")).alias("u"),
            F.greatest(F.col("v"), F.col("m")).alias("v"),
        )
        out = hooked if large else hooked.unionByName(
            j.select(F.least(F.col("u"), F.col("m")).alias("u"),
                     F.greatest(F.col("u"), F.col("m")).alias("v")).distinct()
        )
        return out.where(F.col("u") != F.col("v")).distinct()

    def step(e: DataFrame, i: int) -> DataFrame:
        return star(star(e, large=True), large=False)

    def sym_diff(old: DataFrame, new: DataFrame) -> float:
        return float(
            old.exceptAll(new).count() + new.exceptAll(old).count()
        )

    runner = SuperstepRunner(
        spark,
        max_iters=max_iters,
        tol=0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "connected_components_star", **(config_extra or {})},
    )
    res = runner.run(base, step, metric_fn=sym_diff, resume=resume)
    # final edge set is a star forest: every (u, v) has u = component min
    stars = res.state
    comp = (
        _nbrs(stars).groupBy(F.col("v").alias("id"))
        .agg(F.min("u").alias("component"))
        .where(F.col("component") < F.col("id"))
    )
    state = all_verts.join(comp, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )
    all_verts.unpersist()
    return SuperstepResult(
        state, res.iterations, res.converged, res.deltas,
        res.superstep_seconds, res.resumed_from,
    )
