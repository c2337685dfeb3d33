"""Biconnected components and articulation points — arbitrary-spanning-
tree block decomposition (the Tarjan–Vishkin auxiliary-graph idea,
re-derived for ancestor-closure joins instead of Euler-tour preorder).

An articulation point (cut vertex) is a vertex whose removal
disconnects its component — the vertex analog of ``bridges.bridges``
(which repo, if it vanishes, splits the dependency graph). The
biconnected components (blocks) are the maximal subgraphs with no cut
vertex; a vertex is an articulation point iff its incident edges span
≥ 2 blocks.

Derivation (first principles, any rooted spanning tree T — identify
each tree edge (parent(c), c) by its child vertex c):

* The fundamental cycle of a non-tree edge {x, y} is the tree path
  x→lca→y plus the edge, so ALL tree edges on that path share a block.
  Blocks are exactly the transitive closure of "share a fundamental
  cycle". Unioning whole paths is O(|E|·depth) pairs; two local rules
  generate the same closure:
  - (a) CROSS: if neither endpoint is an ancestor of the other, link
    aux nodes x and y (both are non-roots: a root is an ancestor of
    everything in its component).
  - (b) CHAIN: link c to parent(c) (both tree edges, so
    depth(c) ≥ 2) iff some non-tree edge leaves sub(c) and lands
    OUTSIDE sub(parent(c)) — each fundamental cycle certifies this for
    every consecutive pair strictly below its lca on both branches,
    and certifies nothing at or above the lca (the parent edge of the
    lca is not on the cycle).
  Blocks of T-edges = connected components of the aux graph (star
  contraction, O(log) rounds); a bridge gets no aux edge and is its
  own block. A non-tree edge belongs to the block of its
  descendant-side child edge (cross: either side — rule (a) links
  them; back edge {x, y} with y an ancestor: side x).

* Ancestor tests are joins against ``bridges.ancestor_closure`` — the
  O(|V|·depth)-row pointer-doubled closure — instead of preorder
  intervals, which removes the Euler-tour/list-ranking stage entirely.
  Rule (b)'s certificate is |non-tree endpoint| × depth rows (each
  directed endpoint x joins its ancestors c, then one anti-join drops
  rows where the far endpoint y is still inside sub(parent(c))) —
  the same O(|E|·depth) budget as the closure itself, all
  combiner-backed joins, no per-vertex recursion.

Reference analog: none (L-space ships no algorithms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bridges import _canon, ancestor_closure, oriented_tree
from .components import connected_components_star


def _blocks_internal(
    spark: SparkSession,
    canon: DataFrame,
    num_partitions: int,
    max_rounds: int,
):
    """(tree, edge_blocks) where edge_blocks = every canonical edge
    ``(a, b)`` labeled with its block id (the min child-vertex id among
    the block's tree edges)."""
    tree = oriented_tree(spark, canon, num_partitions,
                         max_rounds=max_rounds).localCheckpoint(eager=True)
    anc = ancestor_closure(tree)

    tree_edges = tree.where(F.col("depth") > 0).select(
        F.least("parent", "id").alias("a"),
        F.greatest("parent", "id").alias("b"),
        F.col("id").alias("c"),
    ).localCheckpoint(eager=True)
    nontree = canon.join(tree_edges.select("a", "b"), ["a", "b"],
                         "left_anti").localCheckpoint(eager=True)

    # ancestor relation between the endpoints of each non-tree edge
    a_anc_b = anc.select(F.col("v").alias("b"), F.col("anc").alias("a"))
    b_anc_a = anc.select(F.col("v").alias("a"), F.col("anc").alias("b"))
    cross = (
        nontree.join(a_anc_b, ["a", "b"], "left_anti")
        .join(b_anc_a, ["a", "b"], "left_anti")
    )
    aux_cross = cross.select(F.col("a").alias("u"), F.col("b").alias("v"))

    # rule (b): directed endpoints (x, y); for every ancestor-or-self c
    # of x with depth(c) >= 2, certify the (c, parent(c)) aux link iff y
    # is NOT inside sub(parent(c)) (anti-join on the closure)
    ends = nontree.select(F.col("a").alias("x"), F.col("b").alias("y")) \
        .unionByName(
            nontree.select(F.col("b").alias("x"), F.col("a").alias("y"))
        )
    tinfo = tree.select(F.col("id").alias("c"), F.col("parent").alias("pc"),
                        F.col("depth").alias("dc"))
    cand = (
        ends.join(anc.select(F.col("v").alias("x"),
                             F.col("anc").alias("c")), "x")
        .join(tinfo, "c")
        .where(F.col("dc") >= 2)
    )
    inside_parent = anc.select(F.col("v").alias("y"),
                               F.col("anc").alias("pc"))
    aux_chain = (
        cand.join(inside_parent, ["y", "pc"], "left_anti")
        .select(F.col("c").alias("u"), F.col("pc").alias("v"))
        .distinct()
    )

    aux = aux_cross.unionByName(aux_chain)
    all_tree_nodes = tree_edges.select(F.col("c").alias("id"))
    blocks = connected_components_star(
        spark, aux.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        vertices=all_tree_nodes,
        num_partitions=num_partitions, resume=False,
    ).state.select(F.col("id").alias("c"), F.col("component").alias("block"))

    tree_labeled = tree_edges.join(blocks, "c").select("a", "b", "block")

    # non-tree edges inherit the block of a descendant-side child edge:
    # back edge {x, y} (y ancestor of x) → side x; cross edge → side a
    # (rule (a) links both sides into one block anyway)
    back = nontree.join(
        a_anc_b, ["a", "b"], "left_semi"  # a is an ancestor of b → side b
    ).select("a", "b", F.col("b").alias("c"))
    back2 = nontree.join(
        b_anc_a, ["a", "b"], "left_semi"
    ).select("a", "b", F.col("a").alias("c"))
    nt_side = cross.select("a", "b", F.col("a").alias("c")) \
        .unionByName(back).unionByName(back2)
    nt_labeled = nt_side.join(blocks, "c").select("a", "b", "block")

    edge_blocks = tree_labeled.unionByName(nt_labeled)
    return tree, edge_blocks


def biconnected_components(
    spark: SparkSession,
    edges: DataFrame,
    num_partitions: int | None = None,
    max_rounds: int = 200,
) -> DataFrame:
    """Every canonical edge ``(a, b, block)`` of the undirected simple
    graph, ``block`` = the min child-vertex id among the block's tree
    edges (deterministic given the hash-weight spanning forest)."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    canon = _canon(edges).localCheckpoint(eager=True)
    _, edge_blocks = _blocks_internal(spark, canon, num_partitions,
                                      max_rounds)
    return edge_blocks


def biconnected_components_canonical(
    spark: SparkSession,
    edges: DataFrame,
    num_partitions: int | None = None,
    max_rounds: int = 200,
) -> DataFrame:
    """``(a, b, block_a, block_b)``: every canonical edge labeled with
    the lexicographically-minimal edge of its block.  The block
    PARTITION is unique (unlike the internal min-child-id labels, which
    depend on the hash-weight spanning forest), so this relabeling is
    engine-independent and admits an exact cross-engine oracle.  One
    combiner-backed min per block + one broadcastable join back
    (#blocks ≤ |E|) on top of the decomposition."""
    eb = biconnected_components(spark, edges, num_partitions, max_rounds)
    m = eb.groupBy("block").agg(
        F.min(F.struct(F.col("a"), F.col("b"))).alias("m")
    )
    return eb.join(m, "block").select(
        "a", "b",
        F.col("m.a").alias("block_a"), F.col("m.b").alias("block_b"),
    )


def articulation_points(
    spark: SparkSession,
    edges: DataFrame,
    num_partitions: int | None = None,
    max_rounds: int = 200,
) -> DataFrame:
    """All cut vertices ``(id)``: vertices whose incident TREE edges
    span ≥ 2 distinct blocks (every block at a vertex contains one of
    its incident tree edges, so tree incidence captures the full block
    set — module doc)."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    canon = _canon(edges).localCheckpoint(eager=True)
    tree, edge_blocks = _blocks_internal(spark, canon, num_partitions,
                                         max_rounds)
    tree_e = tree.where(F.col("depth") > 0).select(
        F.least("parent", "id").alias("a"),
        F.greatest("parent", "id").alias("b"),
        F.col("id").alias("c"), F.col("parent").alias("p"),
    )
    labeled = tree_e.join(
        edge_blocks, ["a", "b"]
    ).select("c", "p", "block")
    incident = labeled.select(F.col("c").alias("id"), "block").unionByName(
        labeled.select(F.col("p").alias("id"), "block")
    )
    return (
        incident.groupBy("id")
        .agg(F.countDistinct("block").alias("nb"))
        .where(F.col("nb") >= 2)
        .select("id")
    )
