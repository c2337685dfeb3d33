"""FastRP-style graph embeddings — very sparse random projection plus
iterated neighbor averaging (Chen et al. 2019, "Fast and Accurate Network
Embeddings via Very Sparse Random Projection"), in EXACT integer
arithmetic.

Shape of the idea: instead of training (node2vec/skipgram), project the
adjacency structure through a deterministic random sign matrix R ∈
{−1,+1}^{|V|×d} and average over neighborhoods: ``x₀ = S·R``,
``x_{k+1}(v) = trunc-mean over in-neighbors of x_k``, embedding =
Σ_k w_k·x_k.  Each power-iteration round mixes one more hop of
structure into the d-dimensional sketch — the whole thing is three
combiner-backed groupBys, no ML runtime.

Determinism/exactness: signs come from the portable 60-bit md5 hash of
``id:dim``; the per-round neighbor mean is an integer TRUNC-division
written sign-split (``sign(m) · (|m| div indeg)``) so only nonnegative
divisions run on either engine — immune to the floor-vs-trunc divergence
between implementations (the repetition_stats round-3 lesson: never let
an oracle lean on version-variable semantics).

Scale shape: state is |V|·d rows ``(id, dim, x)`` — d multiplies the row
count exactly like the multi-source BFS's source axis; each round
equi-joins the src-keyed edge cache and sums per (dst, dim) with
map-side combine.  No windows, no driver loops over vertices.

Reference analog: none (L-space has no embedding machinery); this is the
graph-ML feature stage a training pipeline runs before the skipgram /
GraphSAGE entries that already live in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60

FASTRP_DIMS = 8
FASTRP_ITERS = 3
FASTRP_SCALE = 1 << 20


def fastrp_embeddings(
    edges: DataFrame,
    dims: int = FASTRP_DIMS,
    iters: int = FASTRP_ITERS,
    scale: int = FASTRP_SCALE,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, dim, emb): integer FastRP embedding with uniform hop weights.

    ``x₀(v,dim) = ±scale`` (sign = parity of hash60("v:dim")); round k
    replaces each vertex's vector by the trunc-mean of its in-neighbors'
    vectors (zero-in-degree vertices drop to 0); ``emb = Σ_{k=1..iters}
    x_k``.  |x| ≤ scale at every round (a mean of values bounded by
    scale), so sums are ≤ indeg·scale ≪ 2^63 and emb ≤ iters·scale.
    """
    if iters < 1:
        raise ValueError(f"iters must be ≥ 1, got {iters}")
    if dims < 1:
        # sequence(0, dims-1) auto-steps DESCENDING when dims-1 < 0, so
        # without this guard dims=0 silently yields dims [0, -1]
        raise ValueError(f"dims must be ≥ 1, got {dims}")
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
    indeg = links.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("indeg")
    )
    sign = (
        F.when(F.pmod(
            hash60(F.concat(F.col("id").cast("string"), F.lit(":"),
                            F.col("dim").cast("string"))),
            F.lit(2)) == 0, F.lit(1))
        .otherwise(F.lit(-1))
    )
    x = (
        verts.select(
            "id", F.explode(F.sequence(F.lit(0), F.lit(dims - 1)))
            .alias("dim"),
        )
        .select("id", "dim",
                (sign * F.lit(int(scale))).cast("long").alias("x"))
    )
    hops = []
    for _ in range(iters):
        msgs = (
            links.join(x.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"), "dim")
            .agg(F.sum("x").alias("m"))
        )
        # sign-split trunc-division: only NONNEGATIVE divisions reach
        # either engine (floor-vs-trunc implementations then agree)
        x = (
            msgs.join(indeg, "id")
            .select(
                "id", "dim",
                F.expr(
                    "CASE WHEN m >= 0 THEN m div indeg"
                    " ELSE -((-m) div indeg) END"
                ).cast("long").alias("x"),
            )
        )
        # shallow lineage across rounds (katz_top20 discipline)
        x = x.localCheckpoint(eager=False)
        hops.append(x)
    acc = hops[0]
    for h in hops[1:]:
        acc = acc.unionByName(h)
    acc = acc.groupBy("id", "dim").agg(F.sum("x").alias("x"))
    # vertices whose vector died (no in-edges at some hop) still get a
    # row for every dim — the embedding is a fixed-width feature table
    grid = verts.select(
        "id", F.explode(F.sequence(F.lit(0), F.lit(dims - 1))).alias("dim")
    )
    return (
        grid.join(acc, ["id", "dim"], "left")
        .select("id", "dim",
                F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("emb"))
    )
