"""Multi-source BFS + sampled harmonic centrality.

Exact centralities need all-pairs distances (O(V·E) — off the table at
link-graph scale); the standard scalable estimator runs BFS from a SAMPLE
of sources simultaneously and aggregates per-vertex distances (the idea
HyperBall industrializes with counters). Here the multi-source BFS is ONE
superstep job over a ``(src, id, dist)`` state table — every source's
frontier expands through the same per-round join — so S sources cost one
pass of S·|frontier| rows, not S sequential BFS runs.

Reference analog: none (like the other algorithms, L-space would express
a single BFS as ``Repeat``); determinism: integer hop distances, a
deterministic lowest-id source sample, and harmonic sums quantized before
output, so the unrolled-CTE oracle matches exactly.

Scale notes: state ≤ S·|V| rows — S is the knob (accuracy ∝ 1/√S); the
per-round relaxation joins the state to the src-partitioned edge table and
min-aggregates on (src, dst): same shuffle discipline as SSSP, S-fold row
multiplicity. Harmonic (Σ 1/d) rather than closeness (1/Σd) so unreachable
pairs contribute 0 instead of poisoning the sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepRunner, SuperstepResult


def multi_source_bfs(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    max_iters: int = 20,
    fixed_iters: bool = False,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
    canonical: bool = False,
) -> SuperstepResult:
    """Hop distances from every source at once: state ``(src long, id
    long, dist long)`` holding the reached (source, vertex) pairs; each
    superstep relaxes one hop (state ⋈ edges → min per (src, dst)).
    ``sources`` is a DataFrame with an ``id`` column; rows never reached
    from a source simply don't appear (sparse representation — the dense
    NULL form would be S·V rows regardless of reach).  ``canonical=True``
    asserts ``edges`` is already distinct and self-loop-free, skipping
    the defensive dedup shuffle (callers that just built the closure)."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    import hashlib

    e = edges.select("src", "dst")
    if not canonical:
        e = e.where(F.col("src") != F.col("dst")).distinct()
    e = e.repartition(num_partitions, "src").persist()
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    seed = sources.select("id").distinct().join(verts, "id", "left_semi")
    # the SOURCE SET is part of the computation's identity: pin its digest
    # into the checkpoint config hash so a resume against a different
    # sample is refused instead of silently mixing states (same discipline
    # as sssp's `source` pin). The sample is bounded by design, so
    # collecting the sorted ids is cheap.
    seed_ids = sorted(r["id"] for r in seed.collect())
    seed_digest = hashlib.sha256(
        ",".join(map(str, seed_ids)).encode()
    ).hexdigest()[:16]

    init = seed.select(
        F.col("id").alias("bsrc"), F.col("id"), F.lit(0).cast("long").alias("dist")
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        # expand only the FRONTIER (pairs first reached last round): hop
        # distances are set-once-minimal, so re-relaxing already-settled
        # pairs every round would redo S·|reached|·deg join work for
        # nothing — frontier-only is the textbook BFS cost S·|frontier|
        frontier = state.where(F.col("dist") == i)
        hop = (
            frontier.hint("shuffle_hash").join(e, frontier["id"] == e["src"])
            .select(
                F.col("bsrc").alias("hsrc"), F.col("dst").alias("hid"),
                F.col("dist"),
            )
            .groupBy("hsrc", "hid")
            .agg((F.min("dist") + 1).alias("nd"))
        )
        return state.join(
            hop.hint("shuffle_hash"),
            (state["bsrc"] == hop["hsrc"]) & (state["id"] == hop["hid"]),
            "full",
        ).select(
            F.coalesce(state["bsrc"], hop["hsrc"]).alias("bsrc"),
            F.coalesce(state["id"], hop["hid"]).alias("id"),
            F.least(
                F.coalesce(state["dist"], hop["nd"]),
                F.coalesce(hop["nd"], state["dist"]),
            ).alias("dist"),
        )

    def changed(old: DataFrame, new: DataFrame) -> float:
        # hop distances never improve after first discovery — pairs are
        # only ever ADDED, so growth is the complete convergence signal
        return float(new.count() - old.count())

    runner = SuperstepRunner(
        spark,
        max_iters=max_iters,
        tol=-1.0 if fixed_iters else 0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "multi_source_bfs", "fixed": fixed_iters,
                "sources": seed_digest, "n_sources": len(seed_ids),
                **(config_extra or {})},
    )
    try:
        result = runner.run(
            init, step, metric_fn=None if fixed_iters else changed,
            resume=resume,
        )
    finally:
        e.unpersist()
    return result


def harmonic_centrality_sampled(
    spark: SparkSession,
    edges: DataFrame,
    n_sources: int = 8,
    max_iters: int = 10,
    quantize: int = 9,
    **bfs_kwargs,
) -> DataFrame:
    """(id, harmonic) — Σ over sampled sources s≠v of 1/d(s → v), hop
    distances, deterministic lowest-id source sample. Unreachable pairs
    contribute 0 (the harmonic fix for disconnected graphs); sums are
    quantized to ``quantize`` decimals so fp merge order can't leak into
    exact comparisons. Estimator quality ∝ 1/√n_sources."""
    # sample from the SAME vertex universe the BFS uses (self-loops
    # dropped) — sampling from raw edges could pick a self-loop-only
    # vertex the BFS then discards, silently shrinking the sample and
    # diverging from the oracle
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    sources = verts.orderBy("id").limit(n_sources)
    res = multi_source_bfs(
        spark, edges, sources, max_iters=max_iters, fixed_iters=True,
        **bfs_kwargs,
    )
    return (
        res.state.where(F.col("bsrc") != F.col("id"))
        .groupBy("id")
        .agg(
            F.round(
                F.sum(F.lit(1.0) / F.col("dist").cast("double")), quantize
            ).alias("harmonic")
        )
    )


# ---- eigenvector centrality (fixed-point power iteration) -------------------

EIG_TARGET = 1 << 40  # renormalization target for the total mass
EIG_ITERS = 6


def eigenvector_centrality_fixed(
    edges: DataFrame,
    iters: int = EIG_ITERS,
    target: int = EIG_TARGET,
    num_partitions: int | None = None,
) -> DataFrame:
    """Eigenvector centrality by ``iters`` rounds of INTEGER power
    iteration (Bonacich 1972) — the undamped, in-degree-weighted parent
    of Katz/PageRank: ``x_{j+1}(v) = Σ_{u→v} x_j(u)``, renormalized each
    round by the shared integer denominator ``q = max(1, total // target)``
    (``x' = x // q``), so every value is an exact bigint on both engines
    and the direction converges to the principal eigenvector of Aᵀ.

    Bounds (why this never overflows a long): x₀ is the UNIFORM vector
    ``max(1, target // |V|)`` per vertex, so the total mass is ≤
    ~``target + |V|`` from round 0 onward (each renormalization floor
    loses < 1 unit of q per vertex); any single propagated value — a sum
    over in-neighbors of values whose global sum is ~target — is
    ≤ ~2·target ≈ 2^41, and the propagation TOTAL is ≤ total·maxoutdeg,
    i.e. safe while ``target · maxoutdeg < 2^63`` (maxoutdeg < 2^22 at
    the default target; lower ``target`` for hubbier graphs — the knob
    trades per-round precision against headroom).  A target-valued init
    for every vertex (the first cut) broke its own bound in ROUND 1:
    q's sum over prop would reach |E|·target — int64-wrapping from
    |E| ≥ 2^23 — while the HUGEINT DuckDB oracle stayed exact.

    Scale shape: identical inner loop to Katz/PageRank — the |V|-row
    vector equi-joins the src-keyed edge cache, one combiner-backed sum,
    one broadcast 1-row total per round. Returns ``(id, score)`` with
    zero-in-degree vertices at 0.

    Reference analog: none directly (L-space has no algorithm library);
    expressible there only as a hand-rolled Repeat loop
    (core/.../librarian/task — the traversal executors).
    """
    links = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst").distinct()
    )
    if num_partitions:
        links = links.repartition(num_partitions, "src")
    links = links.persist()
    verts = (
        links.select(F.col("src").alias("id"))
        .unionByName(links.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = verts.count()
    if n == 0:
        return verts.select("id", F.lit(0).cast("long").alias("score"))
    x0 = max(1, int(target) // n)
    x = verts.select("id", F.lit(x0).cast("long").alias("x"))
    for _ in range(iters):
        prop = (
            links.join(x.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("x").alias("x"))
        )
        # `div` keeps every step in exact LONG arithmetic — a float `/`
        # could round an exact quotient boundary and break the oracle
        q = prop.agg(F.sum("x").alias("t")).select(
            F.expr(f"greatest(CAST(1 AS BIGINT), t div {int(target)})")
            .alias("q")
        )
        x = (
            verts.join(prop, "id", "left")
            .crossJoin(F.broadcast(q))
            .select(
                "id",
                F.expr("coalesce(x, CAST(0 AS BIGINT)) div q").alias("x"),
            )
        )
        # shallow lineage: each round otherwise re-derives every prior
        # propagation on the final action (same discipline as katz_top20)
        x = x.localCheckpoint(eager=False)
    return x.select("id", F.col("x").alias("score"))


def double_sweep(
    spark: SparkSession,
    und_edges: DataFrame,
    rounds: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Double-sweep diameter probe over a canonical undirected closure
    (distinct, loop-free, both orientations): BFS from the lowest-id
    vertex, take the farthest vertex (tie → lowest id), BFS again from
    there. Returns one row (seed, far, diameter_lb, far_reach) — the
    standard high-quality diameter lower bound (exact on trees;
    Magnien-Latapy-Habib's iterated variant starts exactly like this).
    Cost: two multi_source_bfs jobs + two single-row argmax reads,
    independent of graph size beyond the BFS itself."""
    first = und_edges.agg(F.min("src")).first()[0]
    if first is None:
        return spark.createDataFrame(
            [], "seed long, far long, diameter_lb long, far_reach long")
    seed = int(first)
    seed_df = spark.range(1).select(F.lit(seed).cast("long").alias("id"))
    r1 = multi_source_bfs(
        spark, und_edges, seed_df, max_iters=rounds, fixed_iters=True,
        canonical=True, num_partitions=num_partitions, resume=False,
    )
    far = int(
        r1.state.orderBy(F.desc("dist"), F.asc("id")).limit(1).first()["id"]
    )
    far_df = spark.range(1).select(F.lit(far).cast("long").alias("id"))
    r2 = multi_source_bfs(
        spark, und_edges, far_df, max_iters=rounds, fixed_iters=True,
        canonical=True, num_partitions=num_partitions, resume=False,
    )
    return (
        r2.state.agg(
            F.max("dist").cast("long").alias("diameter_lb"),
            F.sum(F.when(F.col("dist") > 0, 1).otherwise(0))
            .cast("long").alias("far_reach"),
        )
        .select(
            F.lit(seed).cast("long").alias("seed"),
            F.lit(far).cast("long").alias("far"),
            "diameter_lb", "far_reach",
        )
    )
