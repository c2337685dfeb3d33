"""SemDeDup — semantic deduplication via k-means bucketing + in-cluster
cosine pruning (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication").

The production recipe for embedding-level dedup of web corpora: cluster
the embedding space (so candidate pairs are only generated WITHIN a
cluster), then inside each cluster drop every vector that has a
near-duplicate with a smaller id. Composition of two operators this
engine already carries the exact-oracle machinery for:

1. **bucketing** = ``clustering.kmeans_fixed`` — deterministic integer
   Lloyd (e6-quantized vectors, integer squared distances, integer-div
   centroid means), so the cluster assignment itself is a pure function
   of the input and the SQL oracle can replay it round for round.
2. **pruning** = within-cluster pair join with the engine's standard
   quantized cosine (``round(dot/(‖a‖·‖b‖), 6)`` — the similarity
   module's cross-engine contract): vector ``j`` is DROPPED iff some
   ``i < j`` in the same cluster has ``sim(i, j) ≥ threshold``;
   ``dup_of`` records the smallest such ``i``. Min-id-wins is the
   deterministic stand-in for the paper's "keep one per duplicate
   group" (the paper keeps a random/centroid-far member; any fixed
   choice preserves the dedup semantics and ours is oracle-exact).

Scale shape: the all-pairs step is quadratic ONLY within a cluster —
exactly the paper's point: k grows with the corpus (they use 50k
clusters for LAION) so the expected cluster size, and hence the pair
fan-out per cluster, stays bounded. The cluster key is the equi-join
key; the wide vectors join onto (id, cluster) pairs, so the shuffled
candidate rows are narrow. Skewed (over-full) clusters are the k-means
analog of LSH hot buckets — the mitigation is raising ``k``, which the
caller owns.

Reference analog: none (L-space has no numeric operators); this is the
embedding-space sibling of the MinHash/SimHash text dedup family
(operators/dedup.py) with the candidate generator swapped from hash
buckets to learned clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import kmeans_fixed
from .similarity import as_double_vec, dot, l2_norm


def semdedup(
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 6,
) -> DataFrame:
    """(vec_id, cluster, keep, dup_of) for every input vector.

    ``keep`` ∈ {0, 1}; ``dup_of`` = smallest same-cluster id with
    quantized cosine ≥ ``threshold`` (−1 for kept rows). The kmeans
    assignment is ``kmeans_fixed(k, iters)`` — deterministic, so the
    whole result is a pure function of the input."""
    # kmeans_fixed's output id column is always named ``vec_id``
    asg = kmeans_fixed(
        embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    ).select(F.col("vec_id").alias("id"), "cluster")
    plain = embeddings.select(
        F.col(id_col).alias("id"), as_double_vec(F.col(vec_col)).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    # candidates = narrow (id, cluster) self-join; vectors attach after
    ca = asg.select(F.col("id").alias("a"), "cluster")
    cb = asg.select(F.col("id").alias("b"), "cluster")
    cand = ca.join(cb, "cluster").where(F.col("a") < F.col("b"))
    va = plain.select(F.col("id").alias("a"), F.col("v").alias("av"),
                      F.col("nrm").alias("an"))
    vb = plain.select(F.col("id").alias("b"), F.col("v").alias("bv"),
                      F.col("nrm").alias("bn"))
    sim = F.round(
        dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")),
        quantize,
    )
    dropped = (
        cand.join(va, "a").join(vb, "b")
        .where(sim >= threshold)
        .groupBy(F.col("b").alias("id"))
        .agg(F.min("a").alias("dup_of"))
    )
    return (
        asg.join(dropped, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("cluster").cast("long").alias("cluster"),
            F.when(F.col("dup_of").isNull(), F.lit(1)).otherwise(F.lit(0))
            .cast("long").alias("keep"),
            F.coalesce(F.col("dup_of"), F.lit(-1)).cast("long")
            .alias("dup_of"),
        )
    )
