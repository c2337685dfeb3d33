"""Densest subgraph — parallel greedy peeling, 2(1+ε)-approximation.

The MapReduce-native densest-subgraph algorithm (Bahmani, Kumar,
Vassilvitskii, VLDB 2012; sequential ancestor Charikar 2000): repeat
{ compute density ρ = |E|/|V| of the current induced subgraph; delete
EVERY vertex with deg ≤ 2(1+ε)ρ } until the graph is empty, and return
the densest of the intermediate vertex sets. Each round removes at
least the minimum-degree vertex (min-deg ≤ 2ρ ≤ 2(1+ε)ρ always), and
with ε > 0 removes a constant fraction, so the loop finishes in
O(log_{1+ε} |V|) rounds — the property that makes it THE bulk-parallel
formulation, vs the sequential one-vertex-per-round Charikar peel. The
best intermediate set is a 2(1+ε)-approximation of the maximum-density
subgraph. In the repo-dependency reading this extracts the mutually-
entangled dependency core of the link graph.

Exactness contract: ε is a RATIONAL (1+ε = eps_num/eps_den, default
3/2), so the deletion test is pure-integer cross-multiplication —
``deg · |V| · eps_den > eps_num · Σdeg`` (Σdeg = 2|E|) — and densities
are reported as the integer fixed point ``(2·10⁶·|E| + |V|) div
(2·|V|)`` = round(10⁶·ρ). No float enters the control flow, so the
round trace and the winning vertex set are bit-reproducible in any
engine — the basis of the unrolled SQL oracle in queries.py.

Scale shape: state is the |V_i|-row ``(v, d)`` degree table; each round
is (a) one row-count + one sum on the persisted state collapsed into a
single scalar read, (b) a semi-join of the ORIGINAL persisted edge
table against the surviving vertices (two hash joins on v), (c) a
combiner-backed degree count. Nothing ever materializes more than
|E₀| rows, the edge table is persisted once and never shuffled again
(the per-round induced slice is a join against a shrinking vertex
set), and the round count is logarithmic. Runs on ``SuperstepRunner``,
so durable checkpoints / resume / lineage metadata (north rule) come
for free; the winning vertex set is rebuilt by a deterministic REPLAY
of the recorded integer thresholds — no per-round state retention, the
replay is a lazily-fused chain of join/filter rounds.

Reference analog: none (L-space ships no subgraph-mining step); the
closest idiom is a manual ``Repeat(has(degree gt x))`` peel
(``step/Repeat.scala:100``, ``step/Has.scala``) which cannot express
the data-dependent density threshold.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from ..plans.superstep import SuperstepResult, SuperstepRunner


def _und_simple(edges: DataFrame) -> DataFrame:
    """Unique undirected pairs (a < b), self-loops dropped."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )


def _degrees(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )


def density_e6(nv: int, ne: int) -> int:
    """round(10⁶ · ne/nv) in pure integer arithmetic."""
    return (2_000_000 * ne + nv) // (2 * nv)


@dataclass
class DensestResult:
    rounds: list[tuple[int, int, int]]  # (round, nv, ne) while nv > 0
    best_round: int                     # -1 when the graph is empty
    members: DataFrame                  # (v) of the best round's set
    superstep: SuperstepResult


def densest_subgraph(
    spark: SparkSession,
    edges: DataFrame,
    eps_num: int = 3,
    eps_den: int = 2,
    max_rounds: int = 64,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> DensestResult:
    """Peel ``edges`` (directed rows; undirected simple graph semantics)
    with threshold factor 2·(eps_num/eps_den) and return the densest
    intermediate vertex set plus the full integer round trace.
    ``resume=False`` forces a clean recompute (existing checkpoints AND
    the trace sidecar are ignored); ``config_extra`` (e.g. an input
    snapshot fingerprint) is folded into the checkpoint config hash so
    a resume against different data is refused."""
    if num_partitions:
        edges = edges.repartition(num_partitions, "src")
    e0 = _und_simple(edges).persist()
    init = _degrees(e0)

    runner = SuperstepRunner(
        spark,
        max_iters=max_rounds,
        tol=0.0,
        checkpoint_dir=checkpoint_dir,
        config={
            "algo": "densest_peel",
            "eps_num": eps_num,
            "eps_den": eps_den,
            **(config_extra or {}),
        },
    )

    # The winning set depends on the WHOLE round trace, not just the
    # latest state, so the trace rides along as a durable sidecar next
    # to the runner's checkpoints (keyed by the same config hash): a
    # resumed run — even one that resumes a fully-converged peel and
    # never executes a superstep — still reconstructs the winner. A
    # lost/alien sidecar falls back to a deterministic full recompute.
    trace: dict[int, tuple[int, int]] = {}
    sidecar = (
        os.path.join(checkpoint_dir, "peel_rounds.json")
        if checkpoint_dir else None
    )
    if resume and sidecar and os.path.exists(sidecar):
        try:
            with open(sidecar) as f:
                blob = json.load(f)
            if blob.get("config_hash") == runner.config_hash:
                trace = {
                    int(k): (int(v[0]), int(v[1]))
                    for k, v in blob["rounds"].items()
                }
        except (ValueError, KeyError, OSError):
            trace = {}

    def record(i: int, nv: int, ne: int) -> None:
        trace[i] = (nv, ne)
        if sidecar:
            os.makedirs(checkpoint_dir, exist_ok=True)
            tmp = sidecar + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {"config_hash": runner.config_hash,
                     "rounds": {str(k): list(v) for k, v in trace.items()}},
                    f,
                )
            os.replace(tmp, sidecar)

    def _stat(state: DataFrame) -> tuple[int, int]:
        row = state.agg(
            F.count(F.lit(1)).alias("nv"), F.sum("d").alias("t2")
        ).first()
        nv = int(row["nv"])
        return nv, int(row["t2"] or 0) // 2

    def induced_degrees(keep: DataFrame) -> DataFrame:
        ka = keep.select(F.col("v").alias("a"))
        kb = keep.select(F.col("v").alias("b"))
        ei = e0.join(ka, "a", "semi").join(kb, "b", "semi")
        return keep.join(
            _degrees(ei).withColumnRenamed("d", "di"), "v", "left"
        ).select("v", F.coalesce("di", F.lit(0)).alias("d"))

    def step(state: DataFrame, i: int) -> DataFrame:
        # `state` is V_i of the fresh-run numbering both when starting
        # (i=0, init) and when resuming (runner saves step i's output as
        # state_i = V_{i+1} and resumes with i0+1), so keying the trace
        # by the runner iteration lines resumed runs up with fresh ones.
        # single scalar read per round: the collected (nv, ne) both
        # feed the trace AND become the deletion-test literals (no
        # second aggregate pass over the state)
        nv, ne = _stat(state)
        if nv > 0:
            record(i, nv, ne)
        keep = state.where(
            F.col("d") * F.lit(nv * eps_den) > F.lit(eps_num * 2 * ne)
        ).select("v")
        return induced_degrees(keep)

    def metric(_old: DataFrame, new: DataFrame) -> float:
        return float(new.count())

    res = runner.run(init, step, metric_fn=metric, resume=resume)

    ks = sorted(trace)
    if ks != list(range(len(ks))) or (
        not ks and res.resumed_from is not None
    ):
        # resumed without the sidecar's head (deleted/foreign file):
        # rebuild the full trace by re-peeling from e0 — deterministic,
        # O(log V) rounds, stats-only
        trace = {}
        st = init.localCheckpoint(eager=True).transform(strip_plan_stats)
        i = 0
        while i < max_rounds:
            nv, ne = _stat(st)
            if nv == 0:
                break
            trace[i] = (nv, ne)
            st = induced_degrees(
                st.where(
                    F.col("d") * F.lit(nv * eps_den)
                    > F.lit(eps_num * 2 * ne)
                ).select("v")
            ).localCheckpoint(eager=True).transform(strip_plan_stats)
            i += 1

    rounds = [(i, *trace[i]) for i in sorted(trace)]

    best = -1
    for r, nv, ne in rounds:
        if best < 0 or ne * rounds[best][1] > rounds[best][2] * nv:
            best = r
    if best < 0:
        e0.unpersist()
        empty = spark.createDataFrame([], "v long")
        return DensestResult([], -1, empty, res)

    # deterministic replay to round `best` using the RECORDED integer
    # stats — pure lazy join/filter chain, no aggregates, lineage cut
    # every few rounds
    members = _degrees(e0)
    for r, nv, ne in rounds[:best]:
        members = induced_degrees(
            members.where(
                F.col("d") * F.lit(nv * eps_den) > F.lit(eps_num * 2 * ne)
            ).select("v")
        )
        if (r + 1) % 4 == 0:
            members = members.localCheckpoint(eager=False)
    members = members.select("v")
    return DensestResult(rounds, best, members, res)
