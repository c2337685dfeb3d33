"""Sampled bounded-depth betweenness centrality — Brandes' dependency
accumulation, integer-exact.

Exact betweenness is all-pairs (O(V·E), hopeless at link-graph scale);
the standard estimator (Brandes & Pich 2007) runs the two Brandes
passes from a SAMPLE of sources, and the standard bound (k-betweenness)
considers only shortest paths of ≤ ``max_depth`` hops. Both knobs are
explicit here: ``n_sources`` hash-chosen sources (deterministic, like
harmonic centrality's sample), ``max_depth`` forward levels.

The two passes are level-synchronous DataFrame jobs keyed by
``(source, vertex)`` — all sources advance through the SAME per-level
join, so S sources cost one pass of S-fold rows, not S sequential runs
(the multi_source_bfs discipline, plus the path-count column):

- forward: frontier ⋈ edges, anti-join the visited set, ``sum(sigma)``
  per (source, vertex) — sigma = #shortest paths, an exact integer;
- backward, level D−1 … 1: every edge (v, w) into the next level
  contributes ``(σ_v · (1e9 + δ_w)) div σ_w`` — Brandes'
  ``σ_v/σ_w · (1 + δ_w)`` held in e9 FIXED POINT with integer floor
  division, so per-level sums are order-independent and the whole
  accumulation is bit-reproducible in SQL (the same
  round-before-summing contract as ANF/kcore/hits; the rounding error
  is ≤ out-degree ulps per level, far below the sampling error the
  estimator already carries).

``bc_e9(v)`` = Σ over sources of δ_e9(source, v) — endpoint
contributions excluded, exactly Brandes. Reference analog: none; this
completes the centrality family (degree, harmonic, PageRank, HITS,
betweenness) the reference's ``Repeat`` interpreter cannot express as
barriers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from ..functions.text import hash60

E9 = 1_000_000_000


def _brandes_passes(
    e: DataFrame,
    n_sources: int,
    max_depth: int,
    seed: str,
) -> tuple[list[DataFrame], list[DataFrame], list[DataFrame]]:
    """Shared Brandes machinery over a persisted self-loop-free edge
    table ``e``: returns ``(levels, deltas, edge_terms)``.

    ``levels[l]`` = (s, v, sigma) at exact hop distance l (eager);
    ``deltas[l]`` = (s, v, delta) e9 dependency for l ≥ 1 (eager;
    index 0 is None — source deltas are never consumed);
    ``edge_terms[l]`` = LAZY (a, b, term) per-edge e9 dependency of the
    level-l→l+1 edges, for l ≥ 0 — built but unevaluated, so the vertex
    consumer pays nothing for them while the edge consumer unions and
    aggregates them. Every eager frame is localCheckpoint-ed, so the
    lazy branches stay cheap to evaluate later."""
    # sample from the SELF-LOOP-FREE universe: a self-loop-only vertex
    # has an empty BFS and would silently occupy a sample slot,
    # shrinking the effective source count (the harmonic-centrality
    # pitfall, centrality.py)
    sample_verts = e.select(F.col("src").alias("id")).unionByName(
        e.select(F.col("dst").alias("id"))
    ).distinct()

    w = Window.orderBy(
        hash60(F.concat_ws(":", F.lit(seed), F.col("id").cast("string"))),
        "id",
    )
    sources = (
        sample_verts.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_sources)
        .select(F.col("id").alias("s"))
    )

    # forward: levels[l] = (s, v, sigma) at exact hop distance l
    f = sources.select("s", F.col("s").alias("v"),
                       F.lit(1).cast("long").alias("sigma"))
    f = f.localCheckpoint(eager=True).transform(strip_plan_stats)
    levels = [f]
    visited = f.select("s", "v").localCheckpoint(eager=True).transform(strip_plan_stats)
    for _ in range(max_depth):
        cand = (
            f.hint("shuffle_hash").join(e, f["v"] == e["src"])
            .groupBy("s", F.col("dst").alias("nv"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        f = (
            cand.join(
                visited,
                (cand["s"] == visited["s"]) & (cand["nv"] == visited["v"]),
                "anti",
            )
            .select("s", F.col("nv").alias("v"), "sigma")
            .localCheckpoint(eager=True).transform(strip_plan_stats)
        )
        if f.isEmpty():
            break
        levels.append(f)
        visited = visited.unionByName(f.select("s", "v")) \
            .localCheckpoint(eager=True).transform(strip_plan_stats)

    # backward: delta in e9 fixed point, deepest level contributes 0
    deltas: list = [None] * len(levels)
    edge_terms: list = [None] * len(levels)
    if len(levels) > 1:
        deltas[-1] = levels[-1].select(
            "s", "v", F.lit(0).cast("long").alias("delta")
        )
    for l in range(len(levels) - 2, -1, -1):
        nxt = levels[l + 1].join(deltas[l + 1], ["s", "v"]).select(
            "s", F.col("v").alias("w"),
            F.col("sigma").alias("sigma_w"), "delta",
        )
        raw = (
            levels[l].alias("fv")
            .join(e, F.col("fv.v") == e["src"])
            .join(
                nxt.alias("nx"),
                (F.col("nx.s") == F.col("fv.s"))
                & (F.col("nx.w") == e["dst"]),
            )
            .select(
                F.col("fv.s").alias("s"), F.col("fv.v").alias("v"),
                e["dst"].alias("w2"),
                F.expr(f"(fv.sigma * ({E9} + delta)) div sigma_w")
                .alias("term"),
            )
        )
        # per-edge dependency of this level's edges — Brandes' edge
        # betweenness: the term IS the edge's share, before the
        # per-vertex sum folds it into delta. Lazy on purpose.
        edge_terms[l] = raw.select(
            F.col("v").alias("a"), F.col("w2").alias("b"), "term"
        )
        if l == 0:
            break  # source deltas are never consumed (endpoint exclusion)
        terms = raw.groupBy("s", "v").agg(F.sum("term").alias("dsum"))
        deltas[l] = (
            levels[l].join(terms, ["s", "v"], "left")
            .select("s", "v",
                    F.coalesce("dsum", F.lit(0)).cast("long").alias("delta"))
            .localCheckpoint(eager=True).transform(strip_plan_stats)
        )
    return levels, deltas, edge_terms


def betweenness_sampled(
    spark: SparkSession,
    edges: DataFrame,
    n_sources: int = 8,
    max_depth: int = 4,
    seed: str = "bc",
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns ``(id long, bc_e9 long)`` for every vertex: sampled
    bounded-depth betweenness in e9 fixed point (0 for vertices on no
    sampled dependency path)."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    e = (
        edges.select("src", "dst").where(F.col("src") != F.col("dst"))
        .distinct().repartition(num_partitions, "src").persist()
    )
    try:
        verts = edges.select(F.col("src").alias("id")).unionByName(
            edges.select(F.col("dst").alias("id"))
        ).distinct().localCheckpoint(eager=True).transform(strip_plan_stats)

        _, deltas, _ = _brandes_passes(e, n_sources, max_depth, seed)

        contrib = None
        for d in deltas[1:]:
            contrib = d if contrib is None else contrib.unionByName(d)
        if contrib is None:  # depth 0 / no expansion: everything scores 0
            out = verts.select("id", F.lit(0).cast("long").alias("bc_e9"))
            return out
        bc = contrib.groupBy("v").agg(F.sum("delta").alias("bc_e9"))
        out = verts.join(bc, verts["id"] == bc["v"], "left").select(
            "id", F.coalesce("bc_e9", F.lit(0)).cast("long").alias("bc_e9")
        ).localCheckpoint(eager=True).transform(strip_plan_stats)
        return out
    finally:
        e.unpersist()


def edge_betweenness_sampled(
    spark: SparkSession,
    edges: DataFrame,
    n_sources: int = 8,
    max_depth: int = 4,
    seed: str = "bc",
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns ``(src long, dst long, ebc_e9 long)`` for every distinct
    non-self-loop directed edge: sampled bounded-depth EDGE betweenness
    (Girvan–Newman's quantity) in e9 fixed point. Same two Brandes
    passes as the vertex version — the per-edge dependency
    ``σ_v/σ_w·(1+δ_w)`` is exactly the backward-pass term BEFORE the
    per-vertex fold, so the edge variant reuses the shared core and
    just aggregates the term stream by edge instead. Unlike vertex
    betweenness, edges OUT OF a source do contribute (endpoint
    exclusion removes vertex endpoints, not edges), hence the level-0
    term branch."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    e = (
        edges.select("src", "dst").where(F.col("src") != F.col("dst"))
        .distinct().repartition(num_partitions, "src").persist()
    )
    try:
        _, _, edge_terms = _brandes_passes(e, n_sources, max_depth, seed)

        contrib = None
        for t in edge_terms:
            if t is not None:
                contrib = t if contrib is None else contrib.unionByName(t)
        if contrib is None:
            return e.select(
                "src", "dst", F.lit(0).cast("long").alias("ebc_e9")
            ).localCheckpoint(eager=True).transform(strip_plan_stats)
        ebc = contrib.groupBy("a", "b").agg(
            F.sum("term").cast("long").alias("ebc_e9")
        )
        out = e.join(
            ebc, (e["src"] == ebc["a"]) & (e["dst"] == ebc["b"]), "left"
        ).select(
            "src", "dst",
            F.coalesce("ebc_e9", F.lit(0)).cast("long").alias("ebc_e9"),
        ).localCheckpoint(eager=True).transform(strip_plan_stats)
        return out
    finally:
        e.unpersist()
