"""Bridges and 2-edge-connected components of an undirected graph.

A bridge is an edge whose removal disconnects its endpoints — the
single-point-of-failure readout of a dependency/link graph (which import
edge, if broken, cuts a whole subtree of repos off). The 2-edge-connected
components are the maximal bridge-free blocks: contract them and the
bridges form the component forest.

Reference analog: none (L-space ships no algorithms); a user could test
one edge with ``Repeat`` reachability but not enumerate all bridges.

Algorithm — spanning tree + cycle-space coverage (the Ahn–Guha–McGregor
sketching trick, deterministic-hash variant):

1. A spanning forest T via Borůvka (``msf.minimum_spanning_forest``)
   under deterministic portable hash weights. Non-tree edges are never
   bridges (they close a cycle with T).
2. Orient T away of each component's root (= the per-component min
   vertex, from star-contraction components — O(log V) rounds): a
   frontier BFS over tree edges, rounds = tree height, refusing (not
   silently truncating) past ``max_rounds``.
3. Every NON-tree edge e gets a 60-bit hash value r(e) XOR-ed onto both
   endpoints: ``val(v) = ⊕ r(e) over non-tree e incident to v``.
4. Bottom-up subtree fold (a pointer-doubled ancestor closure + one
   ``bit_xor`` groupBy — O(log height) rounds):
   ``acc(c) = ⊕ val(v) over v in subtree(c)``. Edges with BOTH endpoints
   in the subtree self-cancel, so ``acc(c)`` is exactly the XOR of the
   r-values of the non-tree edges COVERING tree edge (parent(c), c).
5. Tree edge is reported a bridge iff ``acc(c) == 0``: uncovered ⇒
   always 0 (sound); covered ⇒ 0 only if ≥1 distinct 60-bit hashes XOR
   to zero — probability ≤ 2⁻⁶⁰ per edge, one-sided. The catalog entry
   is gated against a ground-truth (per-edge reachability) oracle, so a
   collision would be caught, not silently wrong.

Scale shape: every stage is |V|- or |E|-row state with combiner-backed
aggregates (``bit_xor`` is associative/commutative); rounds are
O(log V) for the forest and O(tree height) for orientation + fold —
the same round class as hash-min connected components. The upgrade path
for adversarially deep trees is an Euler-tour/list-ranking formulation
(O(log V) rounds at O(|V|) extra rows); not needed at current scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash60
from .components import connected_components_star
from .msf import forest_edges, minimum_spanning_forest


def _canon(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _edge_hash(tag: str) -> F.Column:
    return hash60(
        F.concat(F.lit(tag + ":"), F.col("a").cast("string"), F.lit(":"),
                 F.col("b").cast("string"))
    )


def oriented_tree(
    spark: SparkSession,
    canon: DataFrame,
    num_partitions: int,
    max_rounds: int = 200,
) -> DataFrame:
    """Rooted orientation ``(id, parent, depth)`` of a hash-weight
    spanning forest of ``canon(a, b)``: roots (the per-component min
    vertex, depth 0) carry ``parent = -1``. Internal building block —
    deterministic, not checkpointed (compose under one jobspec
    checkpoint via the catalog entry instead)."""
    weighted = canon.select(
        F.col("a").alias("src"), F.col("b").alias("dst"),
        _edge_hash("bw").alias("w"),
    )
    tree = forest_edges(
        minimum_spanning_forest(
            spark, weighted, num_partitions=num_partitions, resume=False
        )
    ).select("u", "v")

    # star contraction: O(log n) rounds — hash-min's O(diameter) would
    # silently mislabel components past its iteration cap on deep graphs
    cc = connected_components_star(
        spark, canon.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        num_partitions=num_partitions, resume=False,
    ).state

    tsym = (
        tree.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(
            tree.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
        .repartition(num_partitions, "src")
        .persist()
    )
    roots = cc.where(F.col("id") == F.col("component")).select(
        "id",
        F.lit(-1).cast("long").alias("parent"),
        F.lit(0).cast("int").alias("depth"),
    )
    frontier = roots.localCheckpoint(eager=True)
    layers = [frontier]
    exhausted = True
    try:
        for d in range(1, max_rounds + 1):
            # in a TREE, a depth-d vertex's neighbors are exactly its
            # parent (already assigned) and its children — excluding the
            # parent IS the visited check, no anti-join against the
            # accumulated assignment needed (frontier-sized work only)
            new = (
                frontier.hint("shuffle_hash")
                .join(tsym, frontier["id"] == tsym["src"])
                .where(F.col("dst") != F.col("parent"))
                .select(F.col("dst").alias("id"),
                        F.col("src").alias("parent"),
                        F.lit(d).cast("int").alias("depth"))
                .localCheckpoint(eager=True)
            )
            if new.isEmpty():
                exhausted = False
                break
            layers.append(new)
            frontier = new
    finally:
        tsym.unpersist()
    if exhausted:
        # a frontier still alive past the cap means unoriented tree
        # edges, which would silently corrupt the XOR coverage — refuse
        raise RuntimeError(
            f"oriented_tree: spanning tree deeper than max_rounds="
            f"{max_rounds}; raise max_rounds (or switch to an "
            f"Euler-tour orientation) for this graph"
        )
    out = layers[0]
    for layer in layers[1:]:
        out = out.unionByName(layer)
    return out


def ancestor_closure(tree: DataFrame) -> DataFrame:
    """All ``(v, anc)`` ancestor-or-self pairs of a rooted orientation
    ``(id, parent, depth)`` — the O(|V|·depth)-row closure that turns
    every subtree aggregate into ONE join + groupBy. Built by pointer
    doubling in O(log depth) rounds (the j2 leg reaches distances ≥ 2ᵏ
    while the closure holds < 2ᵏ, so the union needs no dedup). This is
    the same budget an Euler-tour formulation would pay for its tour
    table; the closure is the arbitrary-spanning-tree substitute for
    preorder intervals (ancestor TESTS become joins)."""
    max_depth = int(tree.agg(F.max("depth")).collect()[0][0] or 0)
    jump = tree.where(F.col("depth") > 0).select(
        F.col("id").alias("v"), F.col("parent").alias("j")
    ).localCheckpoint(eager=True)
    anc = tree.select(F.col("id").alias("v"), F.col("id").alias("anc")) \
        .unionByName(jump.select("v", F.col("j").alias("anc"))) \
        .localCheckpoint(eager=True)
    k = 1
    while k < max_depth:
        j2 = (
            jump.alias("x")
            .join(jump.alias("y"), F.col("x.j") == F.col("y.v"))
            .select(F.col("x.v").alias("v"), F.col("y.j").alias("j"))
            .localCheckpoint(eager=True)
        )
        anc = (
            anc.unionByName(
                j2.join(anc.withColumnRenamed("v", "m"),
                        F.col("j") == F.col("m"))
                .select("v", "anc")
            )
            .localCheckpoint(eager=True)
        )
        jump = j2
        k *= 2
    return anc


def bridges(
    spark: SparkSession,
    edges: DataFrame,
    num_partitions: int | None = None,
    max_rounds: int = 200,
) -> DataFrame:
    """All bridges ``(a, b)`` (canonical, a < b) of the undirected simple
    graph of ``edges(src, dst)``."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    canon = _canon(edges).persist()
    try:
        tree = oriented_tree(spark, canon, num_partitions,
                             max_rounds=max_rounds)

        tree_edges = tree.where(F.col("depth") > 0).select(
            F.least("parent", "id").alias("a"),
            F.greatest("parent", "id").alias("b"),
        )
        nontree = canon.join(tree_edges, ["a", "b"], "left_anti")
        r = _edge_hash("bx").alias("r")
        ends = nontree.select(F.col("a").alias("id"), r).unionByName(
            nontree.select(F.col("b").alias("id"), r)
        )
        val = ends.groupBy("id").agg(F.expr("bit_xor(r)").alias("val"))

        anc = ancestor_closure(tree)
        sub = (
            anc.join(val, anc["v"] == val["id"])
            .groupBy("anc")
            .agg(F.expr("bit_xor(val)").alias("acc"))
        )
        return (
            tree.where(F.col("depth") > 0)
            .join(sub, tree["id"] == sub["anc"], "left")
            .where(F.coalesce("acc", F.lit(0)) == 0)
            .select(
                F.least("parent", "id").alias("a"),
                F.greatest("parent", "id").alias("b"),
            )
        )
    finally:
        canon.unpersist()


def two_edge_components(
    spark: SparkSession,
    edges: DataFrame,
    num_partitions: int | None = None,
    max_rounds: int = 200,
) -> DataFrame:
    """2-edge-connected component labels ``(id, comp2)`` — ``comp2`` =
    the min vertex id of each maximal bridge-free block (bridge-endpoint
    vertices that end up blockless label themselves). Plan: bridges, an
    anti-join dropping them, then hash-min components over the remainder
    with the ORIGINAL vertex set pinned."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    canon = _canon(edges)
    br = bridges(spark, edges, num_partitions=num_partitions,
                 max_rounds=max_rounds)
    rest = canon.join(br, ["a", "b"], "left_anti")
    verts = (
        canon.select(F.col("a").alias("id"))
        .unionByName(canon.select(F.col("b").alias("id")))
        .distinct()
    )
    res = connected_components_star(
        spark,
        rest.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        vertices=verts,
        num_partitions=num_partitions,
        resume=False,
    )
    return res.state.select("id", F.col("component").alias("comp2"))
