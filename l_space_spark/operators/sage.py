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
    frontier = seeds.select(
        F.col("seed").cast("long").alias("seed"),
        F.col("seed").cast("long").alias("v"),
    )
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
            .localCheckpoint(eager=True)
        )
        layers.append(kept)
        if h < len(fanouts):
            frontier = kept.select("seed", F.col("dst").alias("v")).distinct()
    adj.unpersist()  # every layer is an eager localCheckpoint
    out = layers[0]
    for la in layers[1:]:
        out = out.unionByName(la)
    return out
