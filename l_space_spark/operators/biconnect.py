"""Biconnected components and articulation points — Tarjan–Vishkin
block decomposition over Euler-tour preorder intervals.

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
  - (b) CHAIN: link c to parent(c) (both tree edges — c non-root AND
    parent(c) non-root) iff some non-tree edge leaves sub(c) and lands
    OUTSIDE sub(parent(c)) — each fundamental cycle certifies this for
    every consecutive pair strictly below its lca on both branches,
    and certifies nothing at or above the lca (the parent edge of the
    lca is not on the cycle).
  Blocks of T-edges = connected components of the aux graph (star
  contraction, O(log) rounds); a bridge gets no aux edge and is its
  own block. A non-tree edge belongs to the block of its
  descendant-side child edge (cross: either side — rule (a) links
  them; back edge {x, y} with y an ancestor: side x).

* All tree structure comes from ``bridges.spanning_tour`` — the
  Euler-tour preorder intervals ``[first(v), last(v)]``
  (``eulertour.euler_tour``, O(log V) rounds):
  - ancestor TEST: u anc-or-self of v ⇔ ``first(u) <= first(v) AND
    last(v) <= last(u)`` — two scalar compares after an id equi-join,
    replacing the old O(|V|·depth)-row pointer-doubled ancestor
    closure entirely.
  - rule (b)'s certificate: per vertex, ``g_lo/g_hi(v)`` = min/max
    tour-first of its non-tree neighbors; ``low/high(c)`` = range
    min/max of g over sub(c)'s interval (one doubling sparse table,
    ``eulertour.tour_range_minmax``). y lies outside sub(p) ⇔
    ``first(y)`` outside ``[first(p), last(p)]``, so the link fires
    iff ``low(c) < first(p) OR high(c) > last(p)`` — O(1) per tree
    edge instead of O(depth) candidate rows per non-tree endpoint.

Reference analog: none (L-space ships no algorithms).

Scale shape: every stage is |V|- or |E|-row with O(log V) rounds
(Borůvka + star contraction + list ranking + sparse-table levels); the
sparse table is the one super-linear structure at O(|V| log V) rows —
built by equi-joins, no sorts, no windows over inboxes. No stage
depends on tree depth, so there is no refusal cliff on deep graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ckpt import reset_stats_checkpoint
from .bridges import _canon, spanning_tour
from .components import connected_components_star
from .eulertour import (
    NEUTRAL_HI,
    NEUTRAL_LO,
    range_minmax_query,
    tour_range_minmax,
)


def _blocks_internal(
    spark: SparkSession,
    canon: DataFrame,
    num_partitions: int,
    max_rounds: int,
):
    """(children, edge_blocks) where children = non-root interval rows
    ``(id, parent, first, last)`` and edge_blocks = every canonical
    edge ``(a, b)`` labeled with its block id (the min child-vertex id
    among the block's tree edges)."""
    et = spanning_tour(spark, canon, num_partitions,
                       max_rounds=max_rounds)
    iv = et.intervals
    children = reset_stats_checkpoint(
        iv.where(F.col("parent").isNotNull()))

    tree_edges = children.select(
        F.least("parent", "id").alias("a"),
        F.greatest("parent", "id").alias("b"),
        F.col("id").alias("c"),
    )
    # non-tree edges with both endpoints' intervals attached
    iva = iv.select(F.col("id").alias("a"), F.col("first").alias("fa"),
                    F.col("last").alias("la"))
    ivb = iv.select(F.col("id").alias("b"), F.col("first").alias("fb"),
                    F.col("last").alias("lb"))
    nt = (
        canon.join(tree_edges.select("a", "b"), ["a", "b"], "left_anti")
        .join(iva, "a")
        .join(ivb, "b")
        .withColumn("a_anc_b", (F.col("fa") <= F.col("fb"))
                    & (F.col("lb") <= F.col("la")))
        .withColumn("b_anc_a", (F.col("fb") <= F.col("fa"))
                    & (F.col("la") <= F.col("lb")))
    )
    # stats-reset (plans/ckpt.py): nt feeds the aux edges that the
    # star-contraction block CC self-joins every round — an inherited
    # BigInt size estimate here previously dominated the whole wall
    nt = reset_stats_checkpoint(nt)
    cross = nt.where(~F.col("a_anc_b") & ~F.col("b_anc_a"))
    aux_cross = cross.select(F.col("a").alias("u"), F.col("b").alias("v"))

    # rule (b): per-vertex min/max non-tree-neighbor tour-first, folded
    # over each subtree interval by sparse-table range min/max
    g = (
        nt.select(F.col("a").alias("x"), F.col("fb").alias("fy"))
        .unionByName(nt.select(F.col("b").alias("x"),
                               F.col("fa").alias("fy")))
        .groupBy("x")
        .agg(F.min("fy").alias("glo"), F.max("fy").alias("ghi"))
    )
    placed = (
        et.arcs.select("gpos")
        .join(children.join(g, children["id"] == g["x"]).select(
            F.col("first").alias("gpos"), "glo", "ghi"), "gpos", "left")
        .select(
            "gpos",
            F.coalesce("glo", F.lit(NEUTRAL_LO)).alias("lo"),
            F.coalesce("ghi", F.lit(NEUTRAL_HI)).alias("hi"),
        )
    )
    tall, _ = tour_range_minmax(placed, et.total)

    # candidate chain links: c non-root with non-root parent p
    ivp = iv.select(F.col("id").alias("p"), F.col("parent").alias("pp"),
                    F.col("first").alias("fp"), F.col("last").alias("lp"))
    cand = (
        children.select(F.col("id").alias("c"),
                        F.col("parent").alias("p"), "first", "last")
        .join(ivp, "p")
        .where(F.col("pp").isNotNull())
    )
    scored = range_minmax_query(cand, tall, first_col="first",
                                last_col="last")
    aux_chain = (
        scored.where((F.col("range_lo") < F.col("fp"))
                     | (F.col("range_hi") > F.col("lp")))
        .select(F.col("c").alias("u"), F.col("p").alias("v"))
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
    nt_side = (
        cross.select("a", "b", F.col("a").alias("c"))
        .unionByName(nt.where(F.col("a_anc_b"))
                     .select("a", "b", F.col("b").alias("c")))
        .unionByName(nt.where(F.col("b_anc_a"))
                     .select("a", "b", F.col("a").alias("c")))
    )
    nt_labeled = nt_side.join(blocks, "c").select("a", "b", "block")

    edge_blocks = tree_labeled.unionByName(nt_labeled)
    return children, edge_blocks


def biconnected_components(
    spark: SparkSession,
    edges: DataFrame,
    num_partitions: int | None = None,
    max_rounds: int = 64,
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
    max_rounds: int = 64,
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
    max_rounds: int = 64,
) -> DataFrame:
    """All cut vertices ``(id)``: vertices whose incident TREE edges
    span ≥ 2 distinct blocks (every block at a vertex contains one of
    its incident tree edges, so tree incidence captures the full block
    set — module doc)."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    canon = _canon(edges).localCheckpoint(eager=True)
    children, edge_blocks = _blocks_internal(spark, canon, num_partitions,
                                             max_rounds)
    tree_e = children.select(
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
