"""GraphSAGE-style k-hop neighborhood fanout sampling.

The GNN-minibatch primitive (Hamilton et al. 2017, "Inductive
Representation Learning on Large Graphs" §3.1): for every seed vertex,
sample up to ``fanouts[h]`` distinct out-neighbors at hop ``h+1``,
recursively, producing the edges of the sampled computation graph.  At
training scale this is the operator that turns a 100-TB edge table into
bounded per-seed subgraphs — the sample is taken WHERE THE EDGES LIVE
(equi-join per hop), never by collecting adjacency to the driver.

Determinism: the neighbor race is the portable 60-bit hash of
``(tag, hop, seed, src, dst)`` (functions/text.hash60) with ``dst`` as
tiebreak, so an unrolled ``row_number() OVER (PARTITION BY seed, src
ORDER BY hash, dst)`` oracle reproduces every sampled edge exactly, and
re-running a failed epoch re-draws the identical minibatch.

Skew: a celebrity vertex's candidate list is capped with the same
two-level sharded rank as operators/sampling.group_capped_sample —
the first rank runs on (seed, src, shard) sub-partitions so no single
task ever sorts a full hub adjacency; the second rank sees at most
``shards * fanout`` survivors per (seed, src).

Reference analog: the reference's per-step ``Out`` move with a take —
``lspace``'s N.out() traversal steps (core/.../traversal/Traversal.scala)
— generalized to per-parent bounded sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from ..functions.text import hash60


def khop_fanout_sample(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    fanouts: list[int] | tuple[int, ...] = (3, 2),
    tag: str = "sage",
    shards: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Sampled computation-graph edges ``(seed, hop, src, dst)`` for every
    seed: hop 1 draws ≤ fanouts[0] distinct non-loop out-neighbors of the
    seed, hop h+1 draws ≤ fanouts[h] out-neighbors of every vertex the
    previous hop reached (per seed).  ``seeds`` must have column ``seed``.
    """
    if not fanouts or any(f < 1 for f in fanouts):
        raise ValueError(f"fanouts must be non-empty positive, {fanouts}")
    parts = num_partitions or spark.sparkContext.defaultParallelism
    adj = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .repartition(parts, "src")
        .persist()
    )
    adj.count()
    # dedupe: a seed drawn twice (minibatch with replacement) would
    # otherwise duplicate every candidate row, and the duplicate copies
    # burn row_number fanout slots (fanout 3 → ~1.5 distinct neighbors)
    frontier = seeds.select(
        F.col("seed").cast("long").alias("seed"),
        F.col("seed").cast("long").alias("v"),
    ).distinct()
    layers = []
    for h, fan in enumerate(fanouts, start=1):
        cand = frontier.hint("shuffle_hash").join(
            adj, frontier["v"] == adj["src"]
        ).select("seed", "src", "dst")
        hcol = hash60(
            F.concat_ws(
                ":", F.lit(tag), F.lit(str(h)),
                F.col("seed").cast("string"), F.col("src").cast("string"),
                F.col("dst").cast("string"),
            )
        )
        w1 = Window.partitionBy("seed", "src", "__s").orderBy("__h", "dst")
        w2 = Window.partitionBy("seed", "src").orderBy("__h", "dst")
        kept = (
            cand.withColumn("__h", hcol)
            .withColumn("__s", F.pmod(F.col("__h"), F.lit(shards)))
            .withColumn("__r1", F.row_number().over(w1))
            .where(F.col("__r1") <= fan)
            .withColumn("__r2", F.row_number().over(w2))
            .where(F.col("__r2") <= fan)
            .select("seed", F.lit(h).alias("hop"), "src", "dst")
            .localCheckpoint(eager=True).transform(strip_plan_stats)
        )
        layers.append(kept)
        if h < len(fanouts):
            frontier = kept.select("seed", F.col("dst").alias("v")).distinct()
    adj.unpersist()  # every layer is an eager localCheckpoint
    out = layers[0]
    for la in layers[1:]:
        out = out.unionByName(la)
    return out


def neighbor_feature_sums(
    edges: DataFrame,
    feats: DataFrame,
    dim: int,
    id_col: str = "id",
    vec_col: str = "vec",
    scale: int = 1_000_000,
) -> DataFrame:
    """One round of GNN feature propagation (SIGN / GraphSAGE-mean
    precompute, X' = A·X done relationally): for every vertex, the
    element-wise SUM of its out-neighbors' feature vectors plus the
    neighbor count (so mean-pooling is ``s/n`` downstream), with every
    component quantized to ``1/scale`` fixed point FIRST so the
    aggregation is pure integer arithmetic — exactly reproducible in the
    DuckDB oracle regardless of float summation order.

    Output: (id, n_nbrs, q0..q{dim-1} as long).  ``edges`` must be
    (src, dst) with dst ∈ feats[id_col]; multi-edges/self-loops are the
    caller's policy (not filtered here).

    Plan shape for 100 TB: quantization is a scan-stage ``transform``;
    the join is a plain equi-join on the feature id; the per-vertex sum
    is ONE combiner-backed groupBy with ``dim`` sum columns — partial
    aggregation happens map-side, so a hub's million in-edges reduce
    before the shuffle.  For very high dims the same operator re-shapes
    to (id, pos) keyed sums (posexplode) without changing semantics.
    """
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(
            x.cast("double") * F.lit(float(scale)) + F.lit(0.5)
        ).cast("long"),
    )
    q = feats.select(F.col(id_col).alias("__fid"), qv.alias("__qv"))
    hits = edges.select("src", "dst").join(
        q, F.col("dst") == F.col("__fid")
    )
    return hits.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nbrs"),
        *[
            F.sum(F.col("__qv")[i]).cast("long").alias(f"q{i}")
            for i in range(dim)
        ],
    )
