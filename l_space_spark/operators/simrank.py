"""Sampled SimRank — pairwise structural similarity via coupled
deterministic reverse walks (the Fogaras–Rácz fingerprint estimator,
"Scaling link-based similarity search", WWW'05).

SimRank (Jeh & Widom, KDD'02): s(a,b) = C/(|I(a)||I(b)|) Σ s(i,j) over
in-neighbor pairs, s(a,a)=1.  The exact iteration is O(|V|²) state — a
non-starter at link-graph scale — but SimRank has an exact random-walk
characterization: s(a,b) = E[C^τ] where τ is the first MEETING TIME of
two independent reverse random walks started at a and b.  The sampled
estimator runs R reverse walks per vertex, couples walk r of a with
walk r of b, and averages C^τ over the R replicates (pairs that never
meet within the horizon contribute 0 — the standard T-truncation, whose
bias decays geometrically as C^T).

Everything is deterministic: walks reuse ``walks.random_walks`` (the
hash-argmin successor), so the whole estimator — walk trajectories,
meeting times, fixed-point scores — is bit-reproducible in ANSI SQL and
the catalog entry has an EXACT DuckDB oracle, not a statistical one.

Scale shape: |V|·R walk rows advance by equi-join supersteps (only the
frontier shuffles — ``walks.py``); meetings are ONE self-equi-join of
the (replicate, step, vertex)-keyed position table — never an all-pairs
product.  A bucket of that join is the set of walks co-located at one
vertex at one step; popular attractor vertices fan out quadratically in
their bucket, which is inherent to the OUTPUT (those pairs genuinely
have nonzero SimRank) — the ``max_bucket`` guard caps it for frontier
hygiene and logs nothing silently (capped buckets drop the WHOLE bucket,
an explicit under-estimate documented on the parameter).

Reference analog: none (the reference has no similarity operator); this
rounds out the link-analysis family next to HITS/personalized PageRank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .walks import random_walks

#: C = 3/5 — fixed so the per-meeting score table below stays a literal
#: shared verbatim by the Spark plan and the SQL oracle.
SIMRANK_C = 0.6


def score_table_e6(walk_length: int, c: float = SIMRANK_C) -> dict[int, int]:
    """t → round(C^t · 1e6): the per-meeting fixed-point score, computed
    once in Python and embedded as LITERALS on both engines (no pow() at
    query time, so no cross-engine libm drift)."""
    return {t: round((c ** t) * 1_000_000) for t in range(1, walk_length + 1)}


def simrank_sampled(
    spark: SparkSession,
    edges: DataFrame,
    walk_length: int = 5,
    n_walks: int = 8,
    seed: str = "simrank",
    num_partitions: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Returns ``(a long, b long, sim_e6 long)`` with ``a < b`` for every
    vertex pair whose coupled reverse walks met within ``walk_length``
    steps: ``sim_e6 = floor(Σ_r C^{τ_r} · 1e6 / n_walks)`` (replicates
    that never meet contribute 0; non-meeting pairs are absent — their
    estimate is exactly 0).

    ``max_bucket``: optional skew guard — drop (replicate, step, vertex)
    co-location buckets larger than this BEFORE the pair join (an
    explicit under-estimate for pairs meeting only at mega-attractors;
    None = exact estimator)."""
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    w = random_walks(
        spark, rev, walk_length=walk_length, n_walks=n_walks, seed=seed,
        num_partitions=num_partitions,
    )
    pos = w.select(F.col("start").alias("v"), "r", "step", "vertex")
    if max_bucket is not None:
        sized = pos.groupBy("r", "step", "vertex").agg(
            F.count(F.lit(1)).alias("__bn")
        ).where(F.col("__bn") <= max_bucket).drop("__bn")
        pos = pos.join(sized, ["r", "step", "vertex"])
    a = pos.select(F.col("v").alias("a"), "r", "step", "vertex")
    b = pos.select(F.col("v").alias("b"), "r", "step", "vertex")
    meet = a.join(b, ["r", "step", "vertex"]).where(F.col("a") < F.col("b"))
    tau = meet.groupBy("a", "b", "r").agg(F.min("step").alias("t"))
    scores = score_table_e6(walk_length)
    score = F.lit(None).cast("long")
    for t, s in scores.items():
        score = F.when(F.col("t") == t, F.lit(s)).otherwise(score)
    return (
        tau.select("a", "b", score.alias("s"))
        .groupBy("a", "b")
        .agg(F.sum("s").alias("ss"))
        .select("a", "b", F.expr(f"ss div {n_walks}").alias("sim_e6"))
    )
