"""PPR sweep cut — local community detection around a seed set.

The Andersen–Chung–Lang recipe (ACL, FOCS'06): rank vertices by
personalized-PageRank mass normalized by degree, then sweep prefixes of
that order and report each prefix's conductance φ = cut/min(vol, vol̄);
the best prefix is a provably-good local cluster around the seeds. This
is the "grow a community from these repos" primitive next to the global
partitioners (Louvain, label propagation).

Reference analog: none — the reference can walk from seeds (``Repeat``)
but has no ranking/conductance machinery.

Exactness layering: the PPR ranks are IEEE doubles quantized ONCE to the
gate-verified ``rank_e6`` fixed point (same contract as the
``personalized_pagerank`` entry); everything after is BIGINT — the sweep
order key is ``(rank_e6 · 10⁶) div deg`` (exact integer scaling, ties by
id), cut sizes come from a ±1 difference array over edge endpoint
positions, volumes are running degree sums, and φ is the integer
division ``(2·10⁶·cut + m) div (2·m)``.

Scale shape: only the TOP-K prefix of the sweep is ever materialized
(a top-k, never a global sort — ACL only needs the support of the
approximate PPR vector); the difference array turns per-prefix cut
counting into one |E|-row projection + a groupBy over ≤K rows + one
window over K rows. PPR itself is the flagship power iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from .components import undirect
from .pagerank import pagerank


def ppr_sweep_cut(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    k: int = 40,
    num_partitions: int | None = None,
) -> DataFrame:
    """Sweep curve ``(pos, id, score_key, cut_edges, volume, phi_e6)``
    over the top-``k`` degree-normalized PPR prefix of the undirected
    simple graph; ``phi_e6`` is NULL when the denominator degenerates
    (empty complement). Fixed ``iters`` power-iteration budget."""
    und = undirect(edges).persist()
    topk = None
    try:
        deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        res = pagerank(
            spark, und, damping=damping, tol=-1.0, max_iters=iters,
            resume=False, seeds=seeds, num_partitions=num_partitions,
        )
        ranked = (
            res.state.select(
                "id",
                F.floor(F.col("rank") * F.lit(1e6) + F.lit(0.5))
                .cast("long").alias("rank_e6"),
            )
            .join(deg, F.col("id") == F.col("src"))
            .select(
                "id", "d",
                F.expr("(rank_e6 * 1000000) div d").alias("score_key"),
            )
        )
        topk = (
            ranked.orderBy(F.desc("score_key"), F.asc("id")).limit(k)
            .select(
                "id", "d", "score_key",
                F.row_number().over(
                    Window.orderBy(F.desc("score_key"), F.asc("id"))
                ).cast("long").alias("pos"),
            )
            .persist()
        )
        canon = und.where(F.col("src") < F.col("dst"))
        pa = topk.select(F.col("id").alias("src"), F.col("pos").alias("pa"))
        pb = topk.select(F.col("id").alias("dst"), F.col("pos").alias("pb"))
        kk = F.lit(k + 1).cast("long")
        spans = (
            canon.join(pa, "src", "left").join(pb, "dst", "left")
            .select(
                F.least(F.coalesce("pa", kk), F.coalesce("pb", kk))
                .alias("lo"),
                F.greatest(F.coalesce("pa", kk), F.coalesce("pb", kk))
                .alias("hi"),
            )
            .where(F.col("lo") <= k)
        )
        diffs = (
            spans.select(F.col("lo").alias("pos"), F.lit(1).alias("delta"))
            .unionByName(
                spans.where(F.col("hi") <= k)
                .select(F.col("hi").alias("pos"),
                        F.lit(-1).alias("delta"))
            )
            .groupBy("pos").agg(F.sum("delta").alias("delta"))
        )
        total = und.agg(
            F.count(F.lit(1)).cast("long").alias("total_vol")
        )
        w = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
        curve = (
            topk.join(diffs, "pos", "left")
            .select(
                "pos", "id", "score_key", "d",
                F.coalesce("delta", F.lit(0)).alias("delta"),
            )
            .select(
                "pos", "id", "score_key",
                F.sum("delta").over(w).cast("long").alias("cut_edges"),
                F.sum("d").over(w).cast("long").alias("volume"),
            )
            .join(F.broadcast(total))
        )
        m = F.least(F.col("volume"), F.col("total_vol") - F.col("volume"))
        # materialize (≤ k rows) BEFORE releasing the edge/prefix caches:
        # returning the lazy plan would recompute undirect() once per
        # branch (deg, canon, total, topk) at the caller's action
        return curve.select(
            "pos", "id", "score_key", "cut_edges", "volume",
            F.when(m > 0,
                   F.expr(
                       "(2000000 * cut_edges + least(volume, "
                       "total_vol - volume)) div (2 * least(volume, "
                       "total_vol - volume))"
                   )).cast("long").alias("phi_e6"),
        ).orderBy("pos").localCheckpoint(eager=True).transform(strip_plan_stats)
    finally:
        und.unpersist()
        if topk is not None:
            topk.unpersist()


def best_sweep_cut(curve: DataFrame) -> DataFrame:
    """The argmin-φ prefix of a ``ppr_sweep_cut`` curve (ties → smallest
    prefix): one row ``(pos, id, cut_edges, volume, phi_e6)``."""
    return (
        curve.where(F.col("phi_e6").isNotNull())
        .orderBy(F.asc("phi_e6"), F.asc("pos"))
        .limit(1)
        .select("pos", "id", "cut_edges", "volume", "phi_e6")
    )
