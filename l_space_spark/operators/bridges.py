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
2. Root T at each component's min vertex and list-rank its Euler tour
   (``eulertour.euler_tour`` — pointer doubling, O(log V) rounds
   REGARDLESS of tree depth; components from star contraction,
   O(log V) rounds too). This replaced a frontier-BFS orientation that
   paid one Spark round per tree LEVEL and refused past ``max_rounds``
   on deep trees — a path graph now ranks in ~log2(2V) rounds instead
   of V.
3. Every NON-tree edge e gets a 60-bit hash value r(e) XOR-ed onto both
   endpoints: ``val(v) = ⊕ r(e) over non-tree e incident to v``.
4. Bottom-up subtree fold: place ``val(v)`` at the tour position
   ``first(v)``; because xor is invertible, the subtree aggregate of
   child c is a RANGE query ``prefix[last(c)] ⊕ prefix[first(c)-1]``
   against one sharded prefix-xor scan (``eulertour.tour_prefix_xor``
   — no global window, no O(|V|·depth) ancestor closure). Edges with
   BOTH endpoints in the subtree self-cancel, so ``acc(c)`` is exactly
   the XOR of the r-values of the non-tree edges COVERING tree edge
   (parent(c), c).
5. Tree edge is reported a bridge iff ``acc(c) == 0``: uncovered ⇒
   always 0 (sound); covered ⇒ 0 only if ≥1 distinct 60-bit hashes XOR
   to zero — probability ≤ 2⁻⁶⁰ per edge, one-sided. The catalog entry
   is gated against a ground-truth (per-edge reachability) oracle, so a
   collision would be caught, not silently wrong.

Scale shape: every stage is |V|- or |E|-row state with combiner-backed
aggregates; EVERY round count is O(log V) — Borůvka, star contraction,
list ranking, prefix shards. Nothing depends on tree depth or graph
diameter, so there is no refusal cliff on adversarial inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash60
from ..plans.ckpt import reset_stats_checkpoint
from .components import connected_components_star
from .eulertour import EulerTour, euler_tour, tour_prefix_xor
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


def spanning_tour(
    spark: SparkSession,
    canon: DataFrame,
    num_partitions: int,
    max_rounds: int = 64,
) -> EulerTour:
    """Hash-weight spanning forest of ``canon(a, b)``, rooted at each
    component's min vertex and Euler-tour-ranked: ``intervals(id,
    parent, first, last)`` (parent = -1 at roots) + positioned arcs.
    Deterministic; not checkpointed (compose under one jobspec
    checkpoint via the catalog entry instead). All stages are
    O(log V)-round: Borůvka, star contraction, list ranking."""
    weighted = canon.select(
        F.col("a").alias("src"), F.col("b").alias("dst"),
        _edge_hash("bw").alias("w"),
    )
    tree = forest_edges(
        minimum_spanning_forest(
            spark, weighted, num_partitions=num_partitions, resume=False
        )
    ).select("u", "v")

    # components over the FOREST, not the full graph: identical labels
    # (a spanning forest preserves connectivity and covers every vertex
    # of canon — no isolated vertices survive _canon), |V|-1 edges
    # instead of |E| through the O(log V) star-contraction rounds
    cc = connected_components_star(
        spark, tree.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        num_partitions=num_partitions, resume=False,
    ).state
    return euler_tour(spark, tree, cc, num_partitions,
                      max_rounds=max_rounds)


def bridges(
    spark: SparkSession,
    edges: DataFrame,
    num_partitions: int | None = None,
    max_rounds: int = 64,
) -> DataFrame:
    """All bridges ``(a, b)`` (canonical, a < b) of the undirected simple
    graph of ``edges(src, dst)``."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    canon = _canon(edges).persist()
    try:
        et = spanning_tour(spark, canon, num_partitions,
                           max_rounds=max_rounds)
        children = et.intervals.where(F.col("parent").isNotNull())
        tree_edges = children.select(
            F.least("parent", "id").alias("a"),
            F.greatest("parent", "id").alias("b"),
            "id", "first", "last",
        )
        # stats-reset (plans/ckpt.py): downstream star-contraction /
        # prefix scans re-join these, and the inherited size estimate
        # from canon->Boruvka->CC would otherwise compound
        tree_edges = reset_stats_checkpoint(tree_edges)
        nontree = canon.join(tree_edges.select("a", "b"), ["a", "b"],
                             "left_anti")
        r = _edge_hash("bx").alias("r")
        ends = nontree.select(F.col("a").alias("id"), r).unionByName(
            nontree.select(F.col("b").alias("id"), r)
        )
        val = ends.groupBy("id").agg(F.expr("bit_xor(r)").alias("val"))

        # place val(v) at tour position first(v); subtree xor of child c
        # = prefix[last(c)] ^ strict-prefix[first(c)] (xor is invertible,
        # so no sparse table needed — two equi-joins into one scan)
        placed = (
            et.arcs.select("gpos")
            .join(children.join(val, "id").select(
                F.col("first").alias("gpos"), "val"), "gpos", "left")
            .select("gpos", F.coalesce("val", F.lit(0)).alias("val"))
        )
        px = reset_stats_checkpoint(tour_prefix_xor(placed))
        at_first = px.select(F.col("gpos").alias("first"),
                             F.col("pxe").alias("px_lo"))
        at_last = px.select(F.col("gpos").alias("last"),
                            F.col("pxi").alias("px_hi"))
        return (
            tree_edges.join(at_first, "first").join(at_last, "last")
            .where(F.expr("px_hi ^ px_lo") == 0)
            .select("a", "b")
        )
    finally:
        canon.unpersist()


def two_edge_components(
    spark: SparkSession,
    edges: DataFrame,
    num_partitions: int | None = None,
    max_rounds: int = 64,
) -> DataFrame:
    """2-edge-connected component labels ``(id, comp2)`` — ``comp2`` =
    the min vertex id of each maximal bridge-free block (bridge-endpoint
    vertices that end up blockless label themselves). Plan: bridges, an
    anti-join dropping them, then star-contraction components over the
    remainder with the ORIGINAL vertex set pinned."""
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
