"""Fixed-round Lloyd k-means over an embedding column — the clustering
stage of a training-data curation pipeline (topic bucketing, diversity
sampling, per-cluster quota enforcement), entirely in integer arithmetic
so the result has an exact cross-engine SQL oracle.

Reference analog: none (L-space ships no numeric operators); the closest
public analog is Spark MLlib's KMeans, which this deliberately does not
use: MLlib's init (k-means??) is RNG-seeded and its float reductions are
order-dependent, so no engine-independent oracle can gate it. Here:

* vectors are quantized ONCE to e6 fixed point (``floor(x·1e6)`` — float
  multiply + floor are both correctly rounded, so the quantization is
  bit-identical in any IEEE engine), and every later step is BIGINT:
  squared-L2 distances are integer sums of squares, centroid means are
  the integer division ``(2·Σ + n) div (2·n)`` (both Spark ``div`` and
  DuckDB ``//`` truncate toward zero — verified), argmin ties break by
  the smaller centroid id. The whole run is a deterministic function of
  the input.
* init = the vectors of the k smallest ids (deterministic seed rows, the
  oracle can name them), ``iters`` assignment rounds with an update
  between consecutive rounds — classic fixed-budget Lloyd.

Scale shape (the part that must survive 100×): assignment is
``points × broadcast(centroids)`` — n·k rows, never n·k·dim — with the
squared distance as a JVM-side ``zip_with``/``aggregate`` fold over the
two long arrays (whole-stage codegen, no Python); the update explodes
assigned points once (n·dim rows) into a combiner-backed
``groupBy(cluster, dim)`` mean. Centroids (k·dim longs) are
localCheckpointed per round to keep the unrolled plan flat. No step is
quadratic in n; the only growth knob is k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats


def quantize_vectors(
    df: DataFrame, id_col: str, vec_col: str, scale: int = 1_000_000
) -> DataFrame:
    """(id, v array<long>): e6 fixed-point quantization of a float
    vector column — the exactness boundary every integer op builds on."""
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(scale)))
            .cast("long"),
        ).alias("v"),
    )


def _sqdist(v, cv) -> F.Column:
    return F.aggregate(
        F.zip_with(v, cv, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, z: acc + z,
    )


def kmeans_fixed(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Deterministic fixed-round k-means. Returns one row per input
    vector: ``(vec_id long, cluster long, dist2 long)`` — the assigned
    centroid's seed id and the exact integer squared distance at the
    final assignment."""
    pts = quantize_vectors(df, id_col, vec_col, scale).persist()
    try:
        return _lloyd(pts, k, iters).select(
            F.col("id").alias("vec_id"),
            F.col("c").cast("long").alias("cluster"),
            F.col("dist").alias("dist2"),
        )
    finally:
        pts.unpersist()


def _lloyd(pts: DataFrame, k: int, iters: int) -> DataFrame:
    return _lloyd_with_model(pts, k, iters)[0]


def _lloyd_with_model(
    pts: DataFrame, k: int, iters: int
) -> tuple[DataFrame, DataFrame]:
    """The assignment rounds over persisted ``pts``; the final
    assignment is localCheckpointed (result-sized) so the caller can
    release the points cache before returning the lazy frame.  Also
    returns the centroid table ``(c, cv)`` the final assignment was
    scored against (the trained model — what ADC lookup needs)."""
    cents = (
        pts.orderBy("id").limit(k)
        .select(F.col("id").alias("c"), F.col("v").alias("cv"))
    )
    assign = None
    for t in range(max(1, iters)):
        scored = pts.join(F.broadcast(cents)).select(
            "id", "v",
            F.struct(
                _sqdist(F.col("v"), F.col("cv")).alias("dist"),
                F.col("c").alias("c"),
            ).alias("m"),
        )
        assign = scored.groupBy("id").agg(F.min("m").alias("m")).select(
            "id", F.col("m.c").alias("c"), F.col("m.dist").alias("dist"),
        )
        if t < iters - 1:
            exploded = (
                assign.join(pts, "id")
                .select("c", F.posexplode("v").alias("pos", "val"))
            )
            dims = exploded.groupBy("c", "pos").agg(
                F.expr("(2 * sum(val) + count(*)) div (2 * count(*))")
                .cast("long").alias("m")
            )
            cents = (
                dims.groupBy("c")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "m"))),
                        lambda s: s["m"],
                    ).alias("cv")
                )
                .localCheckpoint(eager=True).transform(strip_plan_stats)
            )
    return assign.localCheckpoint(eager=True).transform(strip_plan_stats), cents


def cluster_sizes(assignment: DataFrame) -> DataFrame:
    """(cluster, n, mean_dist2_e0): per-cluster census of a
    ``kmeans_fixed`` result — the curation-side readout (which topic
    buckets are over/under-represented). Exact integer mean."""
    return (
        assignment.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("(2 * sum(dist2) + count(*)) div (2 * count(*))")
            .cast("long").alias("mean_dist2"),
        )
        .orderBy("cluster")
    )


def pq_codes(
    df: DataFrame,
    n_sub: int = 4,
    sub_dim: int = 16,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Product-quantization codebook assignment (Jégou et al. 2011) —
    the compression stage that turns IVF into IVF-PQ: the vector is cut
    into ``n_sub`` contiguous ``sub_dim``-dim subvectors, each clustered
    independently with the deterministic integer Lloyd rounds
    (``kmeans_fixed``), and the vector's code is its per-subspace
    centroid ids — ``n_sub · log2(k)`` bits instead of ``dim`` floats.

    Returns (vec_id, m, code, dist2): one row per (vector, subspace),
    ``dist2`` the exact integer squared quantization error in that
    subspace.  Every subspace run is the same broadcast-centroid
    integer-exact shape as ``kmeans_fixed`` — n·k scored rows per
    round, never n·k·dim — and the subspaces are independent jobs a
    scheduler can overlap.
    """
    outs = []
    for m in range(n_sub):
        sub = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), m * sub_dim + 1, sub_dim)
            .alias(vec_col),
        )
        outs.append(
            kmeans_fixed(sub, k=k, iters=iters, id_col=id_col,
                         vec_col=vec_col, scale=scale)
            .select(
                "vec_id", F.lit(m).cast("long").alias("m"),
                F.col("cluster").alias("code"), "dist2",
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def pq_adc_topk(
    df: DataFrame,
    n_queries: int,
    top_k: int = 5,
    n_sub: int = 4,
    sub_dim: int = 16,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k search over the PQ codes (Jégou
    et al. 2011 §IV) — the query path that makes IVF-PQ work at scale:
    the database is represented ONLY by its per-subspace codes, each
    query precomputes a tiny (k × n_sub) table of exact integer squared
    distances to the subspace centroids, and the approximate distance
    is a code-keyed LOOKUP-JOIN + sum — never a full-vector scan of the
    corpus.

    Queries are the ``n_queries`` smallest ids (they remain in the
    database; self-hits are excluded from the ranking).  Returns
    (query_id, neighbor, adist2, rnk ≤ top_k), ties broken by neighbor.

    Plan shape: codes are |n|·n_sub skinny rows; the distance tables
    are Q·k·n_sub rows, broadcast; the join key (m, code) has at most
    n_sub·k distinct values, but each key's matches are summed per
    (query, vector) by a combiner-backed groupBy — no window touches a
    corpus-sized partition.
    """
    out = None
    for m in range(n_sub):
        sub = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), m * sub_dim + 1, sub_dim)
            .alias(vec_col),
        )
        pts = quantize_vectors(sub, id_col, vec_col, scale).persist()
        assign, cents = _lloyd_with_model(pts, k, iters)
        qs = pts.where(F.col("id") < n_queries).select(
            F.col("id").alias("qid"), F.col("v").alias("qv")
        )
        dtab = qs.join(F.broadcast(cents)).select(
            "qid", "c", _sqdist(F.col("qv"), F.col("cv")).alias("d2")
        )
        # dtab still derives from pts: checkpoint it (Q·k rows, eager)
        # BEFORE releasing the cache, or the final action re-runs the
        # slice+quantize scan once per subspace through the cold lineage
        dtab = dtab.localCheckpoint(eager=True).transform(strip_plan_stats)
        part = assign.select("id", "c").join(dtab, "c").select(
            "qid", "id", F.col("d2").alias("d2m")
        )
        pts.unpersist()
        out = part if out is None else out.unionByName(part)
    approx = out.groupBy("qid", "id").agg(
        F.sum("d2m").cast("long").alias("adist2")
    ).where(F.col("qid") != F.col("id"))
    w = Window.partitionBy("qid").orderBy("adist2", "id")
    return (
        approx.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= top_k)
        .select(
            F.col("qid").alias("query_id"), F.col("id").alias("neighbor"),
            "adist2", F.col("rnk").cast("long").alias("rnk"),
        )
    )
