"""Louvain phase-1 community detection — synchronized modularity-gain
moves in exact integer arithmetic.

The local-move phase of Louvain (Blondel et al. 2008 §2): every vertex
repeatedly adopts the neighboring community with the best modularity
gain. The sequential algorithm visits vertices one at a time; that
order is inherently serial, so the distributed variant here moves
vertices SYNCHRONOUSLY from the previous round's snapshot, restricted
to one id-parity class per round (even ids move in even rounds, odd in
odd) — the standard semi-synchronous trick that prevents the two
endpoints of an edge from swapping into each other's old communities in
the same round (Prat-Pérez et al.; the same alternation labelprop uses
against bipartite oscillation). On top of parity, the ANCHORED-TARGET
rule: an active vertex may only join a community that currently holds
at least one inactive member (staying is always allowed). Inactive
members cannot move, so a join target can never fully vacate within the
round — this deterministically kills the remaining synchronized
label-chase (two singleton communities adopting each other's labels
forever; see the K4 fixture in tests/test_louvain.py). Deterministic by
construction: no randomness, ties broken by smallest community id.

Gain arithmetic, cross-engine exact: moving v into community C (volumes
taken from the snapshot, v's own degree excluded from its current
community) changes modularity by ``k_{v,C}/m − k_v·Σtot'_C/(2m²)`` plus
terms constant over C, so the argmax over candidates is the argmax of

    score(v, C) = 2m·k_{v,C} − k_v·Σtot'_C        (all BIGINTs)

where ``2m`` = closure row count, ``k_{v,C}`` = v's neighbors inside C,
``Σtot'_C`` = snapshot volume of C minus k_v when C is v's current
community. No doubles anywhere, so the unrolled-CTE DuckDB oracle
compares EXACTLY. Overflow bound: ``2m·deg_max < 2^63`` — holds through
~10^9-edge graphs with 10^9-degree hubs; monitored, same discipline as
betweenness's e9 accumulation.

Scale shape: per round one |E|-row equi-join (neighbor communities,
against the once-hashed closure cache) feeding a combiner-backed
``groupBy(src, com)``, one |V|-row volume aggregate, and one
``max_by``-style struct argmax — never a per-vertex window sort, no
driver loop; only |V|-row tables shuffle per round. The candidate set
is v's NEIGHBOR communities only (plus staying), exactly Louvain's
rule, so a hub's candidate fan-out is its degree, bounded by the same
orientation/salting story as the wedge family.

Convergence: metric = number of vertices that changed community
(monotone in practice but not guaranteed — synchronized local moves can
cycle, hence the ``max_iters`` cap; ``fixed_iters`` replays exactly
``max_iters`` rounds, the oracle-comparable mode). Phase 2 (community
contraction) is the existing ``quotient_graph`` composed on the output.

Reference analog: none — the reference has no community machinery; its
nearest idiom is client-side grouping after repeated ``out()`` moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from ..plans.superstep import SuperstepResult, SuperstepRunner
from .components import undirect


def _move_step(links: DataFrame, degs: DataFrame, m2: int,
               weighted: bool = False):
    """Per-round synchronized local move, factored for plan pinning:
    ``links`` (symmetric closure; with a ``w`` column when ``weighted``)
    and ``degs`` (id, d — plain degree unweighted, STRENGTH weighted)
    must arrive cached and hash-partitioned on their join keys."""

    def step(state: DataFrame, i: int) -> DataFrame:
        # the state arrives materialized by the runner's per-round
        # localCheckpoint, so re-referencing it below is a cached read
        st = state
        active = F.expr(f"(id & 1) = {i % 2}")
        # only the active parity class moves this round: the whole
        # candidate/score pipeline is computed for that half only (the
        # |E|-row join probes halve — measured 28.5 -> 10.4 s/round at
        # 1M V / 8M E, BENCH/louvain_probe.json, identical output); the
        # inactive half passes through unchanged
        actv = st.where(active)
        # anch marks communities holding >=1 INACTIVE member this round:
        # an active vertex may only join an anchored community (or stay),
        # so a join target can never fully vacate within the round — the
        # deterministic guard against synchronized label-chasing (two
        # singleton communities adopting each other's labels forever,
        # the K4 oscillation in tests/test_louvain.py). Volumes still
        # aggregate over the FULL snapshot.
        vol = (
            st.join(degs.hint("shuffle_hash"), "id")
            .groupBy("com").agg(
                F.sum("d").alias("vol"),
                F.max(
                    F.when(F.expr(f"(id & 1) != {i % 2}"), 1).otherwise(0)
                ).alias("anch"),
            )
        )
        nbr = (
            links.where(F.expr(f"(src & 1) = {i % 2}"))
            .join(
                st.hint("shuffle_hash")
                .select(F.col("id").alias("dst"), F.col("com").alias("c")),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "c")
            .agg((F.sum("w") if weighted else F.count(F.lit(1)))
                 .cast("long").alias("kvc"))
        )
        cand = (
            nbr.unionByName(
                actv.select("id", F.col("com").alias("c"),
                            F.lit(0).cast("long").alias("kvc"))
            )
            .groupBy("id", "c").agg(F.max("kvc").alias("kvc"))
        )
        scored = (
            cand.join(actv.hint("shuffle_hash"), "id")
            .join(degs.hint("shuffle_hash"), "id")
            .join(vol.withColumnRenamed("com", "c").hint("shuffle_hash"),
                  "c")
            .where((F.col("anch") == 1) | (F.col("c") == F.col("com")))
            .select(
                "id",
                F.col("c").alias("cc"),
                (
                    F.lit(m2) * F.col("kvc")
                    - F.col("d")
                    * (F.col("vol")
                       - F.when(F.col("c") == F.col("com"), F.col("d"))
                       .otherwise(F.lit(0)))
                ).alias("score"),
            )
        )
        best = (
            scored.groupBy("id")
            .agg(F.max(F.struct(F.col("score"),
                                (-F.col("cc")).alias("nc"))).alias("b"))
        )
        return best.select("id", (-F.col("b.nc")).alias("com")).unionByName(
            st.where(~active)
        )

    return step


def _moved_metric():
    """Convergence metric shared by both phases: vertices that changed
    community, summed over the LAST TWO rounds. Only one parity class
    moves per round, so a single zero-move round does NOT mean
    convergence (the other class gets its turn next round) — stop on
    two CONSECUTIVE zero rounds. After a resume the previous round's
    count is unknown — seed it as 1 so the first resumed round can
    never stop spuriously (costs at most one extra no-op round)."""
    memo: dict = {"prev": None}

    def moved(old: DataFrame, new: DataFrame) -> float:
        o = old.select("id", F.col("com").alias("oc"))
        now = float(
            new.join(o, "id").where(F.col("com") != F.col("oc")).count()
        )
        prev = memo["prev"] if memo["prev"] is not None else 1.0
        memo["prev"] = now
        return now + prev

    return moved


def louvain_communities(
    spark: SparkSession,
    edges: DataFrame,
    max_iters: int = 12,
    fixed_iters: bool = False,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id long, com long)`` — the
    phase-1 Louvain community of every non-isolated vertex of the
    undirected simple graph (init: singleton communities). In metric
    mode the run stops after two CONSECUTIVE zero-move rounds — one
    zero round is NOT convergence, because only one parity class moves
    per round and the other class gets its turn next; ``fixed_iters``
    replays exactly ``max_iters`` rounds (the oracle-comparable mode,
    parity-resume-safe because the runner passes the GLOBAL round
    index)."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    links = (
        undirect(edges)
        .repartition(num_partitions, "dst")
        .persist()
    )
    degs = (
        links.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .select(F.col("src").alias("id"), "d")
        .repartition(num_partitions, "id")
        .persist()
    )
    m2 = links.count()  # = 2m; also materializes both caches
    degs.count()
    init = degs.select("id", F.col("id").cast("long").alias("com"))

    step = _move_step(links, degs, m2)
    moved = _moved_metric()

    runner = SuperstepRunner(
        spark,
        max_iters=max_iters,
        tol=0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "louvain", "m2": m2, **(config_extra or {}),
                "fixed_iters": max_iters if fixed_iters else None},
        # per-round materialization is REQUIRED: the step references the
        # state four times (volumes, tallies, stay-candidates, passthrough)
        # and unions the inactive half back in, so a lazily fused round
        # would re-derive the prior round 4x — no materialize_every knob
    )
    try:
        result = runner.run(
            init, step, metric_fn=None if fixed_iters else moved,
            resume=resume,
        )
    finally:
        links.unpersist()
        degs.unpersist()
    return result


def louvain_weighted(
    spark: SparkSession,
    wedges: DataFrame,
    max_iters: int = 12,
    fixed_iters: bool = False,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
    weight_col: str = "w",
) -> SuperstepResult:
    """Weighted local-move phase over ``(src, dst, <weight_col>)`` rows
    — the phase-2 engine of multilevel Louvain, run on the quotient
    graph the phase-1 partition contracts to (or any integer-weighted
    undirected graph). Input rows may be in either orientation and may
    repeat (canonicalized + weight-summed here); ``src == dst`` rows are
    self-loops with weight ℓ (a contracted community's internal edges).

    Standard weighted-Louvain conventions, all exact integers:
    ``m = Σ_{a<b} w_ab + Σ ℓ_a``, ``strength(v) = Σ_{u≠v} w_vu + 2ℓ_v``
    (so Σ strength = 2m), ``k_{v,C} = Σ_{u∈C,u≠v} w_vu``, and the same
    cross-multiplied score ``2m·k_{v,C} − strength_v·Σtot'_C`` with
    parity alternation + the anchored-target rule. Self-loops never
    enter k (they travel with the vertex and cancel in the argmax);
    they live only inside strength. Modularity of the quotient under
    these conventions EQUALS modularity of the original graph under the
    composed partition — the multilevel invariant that makes phase 2
    meaningful. Isolated self-loop-only vertices keep their own
    community (no neighbor candidates).

    Overflow bound — TIGHTER than phase 1's: strength and volume on a
    contracted graph both approach 2m, so the score's worst term is
    ~(2m)², requiring ``2m < 2^31.5`` ≈ 3.0e9 TOTAL weight units (vs
    phase 1's 2m·deg_max < 2^63). Beyond ~1.5e9 aggregate edge weight,
    rescale weights (Q's argmax is scale-invariant) before phase 2;
    Spark longs wrap silently where DuckDB promotes to HUGEINT, so an
    unrescaled overflow diverges from the oracle instead of erroring."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    canon = (
        wedges.select(F.least("src", "dst").alias("a"),
                      F.greatest("src", "dst").alias("b"),
                      F.col(weight_col).cast("long").alias("w"))
        .groupBy("a", "b").agg(F.sum("w").alias("w"))
        .persist()  # read 5x below (links both directions, selfw, verts)
    )
    inter = canon.where(F.col("a") != F.col("b"))
    links = (
        inter.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w")
        .unionByName(
            inter.select(F.col("b").alias("src"), F.col("a").alias("dst"),
                         "w"))
        .repartition(num_partitions, "dst")
        .persist()
    )
    selfw = canon.where(F.col("a") == F.col("b")).select(
        F.col("a").alias("id"), F.col("w").alias("l")
    )
    verts = (
        canon.select(F.col("a").alias("id"))
        .unionByName(canon.select(F.col("b").alias("id")))
        .distinct()
    )
    strength = (
        verts
        .join(links.groupBy("src").agg(F.sum("w").alias("s"))
              .withColumnRenamed("src", "id"), "id", "left")
        .join(selfw, "id", "left")
        .select(
            "id",
            (F.coalesce("s", F.lit(0)) + 2 * F.coalesce("l", F.lit(0)))
            .cast("long").alias("d"),
        )
        .repartition(num_partitions, "id")
        .persist()
    )
    m2 = int(strength.agg(F.sum("d")).first()[0] or 0)  # = 2m
    links.count()
    canon.unpersist()  # links + strength are materialized; setup done
    init = strength.select("id", F.col("id").cast("long").alias("com"))

    step = _move_step(links, strength, m2, weighted=True)
    moved = _moved_metric()

    runner = SuperstepRunner(
        spark,
        max_iters=max_iters,
        tol=0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "louvain_weighted", "m2": m2,
                **(config_extra or {}),
                "fixed_iters": max_iters if fixed_iters else None},
    )
    try:
        result = runner.run(
            init, step, metric_fn=None if fixed_iters else moved,
            resume=resume,
        )
    finally:
        links.unpersist()
        strength.unpersist()
    return result


def refine_communities(
    spark: SparkSession,
    edges: DataFrame,
    parent: DataFrame,
    max_iters: int = 8,
    fixed_iters: bool = False,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Leiden-style REFINEMENT of a parent partition (Traag, Waltman &
    van Eck 2019, "From Louvain to Leiden", the refinement-phase idea
    made deterministic): re-run the greedy local moves from SINGLETONS
    on the intra-community edge set only, so every vertex may join only
    communities inside its parent community.  Because candidates come
    exclusively from neighboring communities, every refined community
    grown this way is CONNECTED — the well-known Louvain defect
    (arbitrarily badly disconnected communities, ibid. §2) cannot
    survive refinement.  Deterministic departure from the paper: moves
    are greedy max-gain with the same parity alternation + anchored-
    target rule as phase 1 (no randomized queue), so the unrolled-CTE
    oracle matches exactly.

    ``parent`` is ``(id, com)`` (e.g. ``louvain_communities(...).state``).
    Returns state ``(id long, com long)`` — a refinement of ``parent``:
    every refined community lies inside one parent community; vertices
    with no intra-community edge (all their edges cross parent
    boundaries) come back as singletons.

    Spark shape: ONE extra cost over phase 1 — the intra filter is two
    hash equi-joins of the closure against the |V|-row parent labels;
    after that the per-round plan is exactly phase 1's (|E_intra|-row
    neighbor tally + combiner groupBys + struct argmax), on a strictly
    smaller edge set."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    par = parent.select("id", F.col("com").alias("pcom"))
    und = undirect(edges)
    intra = (
        und
        .join(par.select(F.col("id").alias("src"),
                         F.col("pcom").alias("ps")).hint("shuffle_hash"),
              "src")
        .join(par.select(F.col("id").alias("dst"),
                         F.col("pcom").alias("pd")).hint("shuffle_hash"),
              "dst")
        .where(F.col("ps") == F.col("pd"))
        .select("src", "dst")
        .repartition(num_partitions, "dst")
        .persist()
    )
    degs = (
        intra.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .select(F.col("src").alias("id"), "d")
        .repartition(num_partitions, "id")
        .persist()
    )
    m2 = intra.count()
    degs.count()
    init = degs.select("id", F.col("id").cast("long").alias("com"))

    step = _move_step(intra, degs, m2)
    moved = _moved_metric()

    runner = SuperstepRunner(
        spark,
        max_iters=max_iters,
        tol=0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "louvain_refine", "m2": m2,
                **(config_extra or {}),
                "fixed_iters": max_iters if fixed_iters else None},
    )
    try:
        # vertices whose every edge crosses a parent boundary have no
        # intra degree row and never enter the runner — they are
        # singletons of the refined partition by definition.  Eagerly
        # materialized while degs is still cached (the lazy plan would
        # re-derive the intra join after the unpersist below).
        isolated = (
            par.select("id")
            .join(degs.select("id"), "id", "left_anti")
            .select("id", F.col("id").cast("long").alias("com"))
            .localCheckpoint(eager=True).transform(strip_plan_stats)
        )
        result = runner.run(
            init, step, metric_fn=None if fixed_iters else moved,
            resume=resume,
        )
    finally:
        intra.unpersist()
        degs.unpersist()
    from dataclasses import replace

    return replace(result, state=result.state.unionByName(isolated))
