"""ANF — the approximate neighborhood function N(t) via mergeable
bottom-k sketches (Palmer et al., KDD'02; the HyperANF idea of
Boldi & Vigna, WWW'11, with KMV registers instead of HyperLogLog so the
estimate is bit-reproducible across engines).

``N(t)`` = the number of (v, u) pairs with ``dist(v, u) ≤ t`` — the
curve that yields effective diameter, average distance, and spid at
graph scale WITHOUT any all-pairs computation. Exact distance
computation at 100 TB is hopeless (|V|² state); the sketch version
carries one bottom-k register set per vertex (``k`` longs) and one
superstep per distance unit:

    ball(v, 0)   = {v}
    ball(v, t+1) = {v} ∪ ⋃ over out-edges (v, w) of ball(w, t)

where every ball is represented by the bottom-k of the portable 60-bit
hashes of its members — set union becomes "merge registers and re-take
the bottom-k", which is associative, commutative and idempotent, so it
survives any partitioning/combining order (``sketch.bottom_k_hashes``,
the same two-level shard windows as the KMV distinct sketch: a
celebrity vertex's inbox never sorts in one task).

Scale shape per superstep: state ⋈ edges equi-join (edge table
persisted src-partitioned; only the |V|-row sketch table shuffles),
explode to (vertex, hash) pairs — ≤ |E|·k rows, ANF's inherent
bandwidth price, bounded by choosing k — then the sharded bottom-k
windows. The per-round total ``N(t)`` is an integer-fixed-point sum
(each per-vertex estimate rounds to e3 BEFORE summing, so the float
total is order-independent and oracle-exact, the kcore/hits pattern).

Runs on the shared SuperstepRunner (fixed ``max_t`` rounds, tol=-1, the
HITS shape): durable checkpoints, resume and lineage for free;
``result.deltas[t-1]`` holds N(t)·1e3. Reference analog: none — the
reference's only distance tool is materialized ``Path`` enumeration
(``librarian/traversal/Collection.scala``), which is exactly what does
not scale; this operator is the Spark-native replacement.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash60
from ..plans.superstep import SuperstepResult, SuperstepRunner
from .sketch import DOMAIN, bottom_k_hashes


def _estimate_e3(state: DataFrame, k: int) -> F.Column:
    """Sum over vertices of the KMV estimate of |ball(v)|, as an e3
    fixed-point bigint (order-independent, bit-reproducible in SQL)."""
    n_kept = F.size("sk")
    kth = F.element_at(F.col("sk"), k).cast("double")
    est = F.when(n_kept < k, n_kept.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(DOMAIN) / kth
    )
    return F.sum(
        F.floor(est * F.lit(1000.0) + F.lit(0.5)).cast("long")
    ).alias("total_e3")


def neighborhood_function(
    spark: SparkSession,
    edges: DataFrame,
    max_t: int = 3,
    k: int = 16,
    shards: int = 16,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """Returns ``(totals, result)``: ``totals`` is an e3 fixed-point
    ``(t int, total_e3 long)`` DataFrame of N(0)..N(max_t) estimates
    (N(0) = |V| exactly — every sketch starts unsaturated), ``result``
    the superstep result whose ``state`` holds the final per-vertex
    ball sketches ``(id, sk)`` for reuse (e.g. a deeper continuation).
    A RESUMED run reports only the rounds it executed (labels start at
    ``resumed_from + 2``); the earlier curve points are in the prior
    run's output — totals are captured per round, not reconstructable
    from a checkpointed state alone.

    ``totals`` is exact for balls with < k members and the standard
    (k−1)·2^60/kth KMV estimator beyond — deterministic for fixed k, so
    the catalog entry carries an exact SQL oracle despite being an
    approximate operator.
    """
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    # the only per-round edge join is on dst (pull from out-neighbors),
    # so the cache is dst-partitioned: plan-audited to ZERO per-round
    # exchanges on the |E| side (src-partitioning here cost one |E|
    # re-shuffle every superstep)
    e = (
        edges.select("src", "dst").distinct()
        .repartition(num_partitions, "dst")
        .persist()
    )
    verts = e.select(F.col("src").alias("id")).unionByName(
        e.select(F.col("dst").alias("id"))
    ).distinct()

    init = verts.select(
        "id", F.array(hash60(F.col("id").cast("string"))).alias("sk")
    )

    ej = e.select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"))

    def step(state: DataFrame, i: int) -> DataFrame:
        inbox = (
            state.hint("shuffle_hash")
            .join(ej, state["id"] == ej["e_dst"])
            .select(F.col("e_src").alias("g"), F.explode("sk").alias("h"))
            .groupBy("g", "h")
            .agg(F.lit(1).alias("__one"))
        )
        merged = bottom_k_hashes(inbox, k, shards).select(
            "g", F.col("sketch").alias("nbr_sk")
        )
        return state.join(
            merged.hint("shuffle_hash"), state["id"] == merged["g"], "left"
        ).select(
            state["id"],
            F.slice(
                F.array_sort(
                    F.array_union(
                        F.col("sk"),
                        F.coalesce(
                            "nbr_sk", F.array().cast("array<long>")
                        ),
                    )
                ),
                1,
                k,
            ).alias("sk"),
        )

    # exact per-round totals captured driver-side as Python ints: the
    # runner's deltas go through float, which would round totals above
    # 2^53 (reachable-pair counts at 1e9-vertex scale exceed that)
    exact_totals: list[int] = []

    def round_total(old: DataFrame, new: DataFrame) -> float:
        t = int(new.agg(_estimate_e3(new, k)).collect()[0][0])
        exact_totals.append(t)
        return float(t)

    runner = SuperstepRunner(
        spark,
        max_iters=max_t,
        tol=-1.0,  # fixed rounds, metric records N(t) per round
        checkpoint_dir=checkpoint_dir,
        config={"algo": "anf", "k": k, **(config_extra or {})},
    )
    try:
        result = runner.run(init, step, metric_fn=round_total, resume=resume)

        # label totals by the rounds THIS run actually executed: a
        # resumed run starts at resumed_from + 1 and its first measured
        # total is N(resumed_from + 2); earlier points live in the
        # prior run's output
        first_t = 1 if result.resumed_from is None else result.resumed_from + 2
        rows = [(t, n) for t, n in zip(
            range(first_t, first_t + len(exact_totals)), exact_totals)]
        if result.resumed_from is None:
            rows = [(0, verts.count() * 1000)] + rows
        totals = spark.createDataFrame(rows, "t int, total_e3 long")
    finally:
        e.unpersist()
    return totals, result


def distance_stats(totals_rows: list) -> dict:
    """Distance statistics from a neighborhood-function curve — the
    payoff of ANF (Palmer et al. §1: effective diameter and average
    distance WITHOUT all-pairs work). Input: the ``(t, total_e3)`` rows
    of ``neighborhood_function``'s totals (driver-side — the curve is
    max_t+1 integers, born on the driver).

    - ``avg_dist_e6``: Σ t·(N(t)−N(t−1)) / (N(T)−N(0)) over reachable
      non-self pairs within the horizon — exact integer numerator and
      denominator through ONE IEEE division, e6 fixed point.
    - ``eff_diam_e6``: smallest interpolated t where N(t) ≥ 0.9·N(T).
      α is FIXED at 9/10 so the threshold test is pure integer
      arithmetic (``10·N(t) ≥ 9·N(T)``); only the final interpolation
      divides. A float α would not survive the cross-engine exactness
      contract.

    Returns ``{"avg_dist_e6": int, "eff_diam_e6": int}``; both are -1
    when the curve is degenerate (no pairs beyond t=0).
    """
    pts = sorted((int(r["t"]), int(r["total_e3"])) for r in totals_rows)
    if len(pts) < 2 or pts[-1][1] <= pts[0][1]:
        return {"avg_dist_e6": -1, "eff_diam_e6": -1}
    n0, nT = pts[0][1], pts[-1][1]
    num = sum(t * (n - prev_n)
              for (_, prev_n), (t, n) in zip(pts, pts[1:]))
    avg = math.floor(num / (nT - n0) * 1_000_000 + 0.5)
    if 10 * n0 >= 9 * nT:
        eff = 0  # threshold already met at t=0 (near-flat curve)
    else:
        eff = -1
        for (tp, prev_n), (t, n) in zip(pts, pts[1:]):
            if 10 * n >= 9 * nT:
                if n == prev_n:
                    eff = t * 1_000_000
                else:
                    eff = math.floor(
                        (tp + (9 * nT - 10 * prev_n)
                         / (10 * (n - prev_n))) * 1_000_000 + 0.5
                    )
                break
    return {"avg_dist_e6": avg, "eff_diam_e6": eff}
