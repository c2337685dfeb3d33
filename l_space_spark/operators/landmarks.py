"""Landmark distance oracle — bounded shortest-path estimates at scale.

Reference analog: none built in; L-space users approximate pairwise
distance with bounded ``Repeat`` probes per query pair
(``step/Repeat.scala:100``), re-walking the graph for EVERY pair.  The
web-graph-scale formulation (Potamias et al., "Fast Shortest Path
Distance Estimation in Large Networks", CIKM 2009) inverts that: BFS
once from k high-degree landmarks, then answer any pair (u, v) with the
triangle-inequality upper bound ``min_l d(u,l) + d(l,v)``.

Spark shape: landmark selection is one degree groupBy + top-k; the BFS
is the shared multi-source superstep job (state ≤ k·|V| rows, frontier
relaxation against the src-partitioned edge table — operators/
centrality.multi_source_bfs); the per-pair bound is two equi-joins of
the query pairs against the (landmark, vertex, dist) table followed by
a combiner-backed min — never an all-pairs product, and the distance
table can be persisted once and reused across query batches.  Hop
distances are exact integers, so the unrolled-CTE DuckDB oracle matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .centrality import multi_source_bfs
from .components import undirect as undirected_closure


def select_landmarks(edges_und: DataFrame, k: int) -> DataFrame:
    """Top-``k`` vertices by undirected degree, ties broken by lowest id
    (high-degree landmarks minimize the expected bound slack)."""
    return (
        edges_und.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy(F.desc("deg"), "id")
        .limit(k)
        .select("id")
    )


def landmark_distances(
    spark: SparkSession,
    edges: DataFrame,
    n_landmarks: int = 4,
    max_iters: int = 6,
    num_partitions: int | None = None,
    resume: bool = False,
    checkpoint_dir: str | None = None,
    edges_und: DataFrame | None = None,
    config_extra: dict | None = None,
) -> DataFrame:
    """(bsrc, id, dist): hop distance from each landmark to every vertex
    reached within ``max_iters`` rounds (sparse — unreached pairs are
    absent).  One multi-source BFS job regardless of k.  Pass a
    precomputed ``edges_und`` (distinct symmetric closure) to share one
    closure shuffle with the caller instead of rebuilding it here."""
    und = edges_und if edges_und is not None else undirected_closure(edges)
    lm = select_landmarks(und, n_landmarks)
    return multi_source_bfs(
        spark, und, lm, max_iters=max_iters, fixed_iters=True,
        num_partitions=num_partitions, resume=resume,
        checkpoint_dir=checkpoint_dir, canonical=True,
        config_extra={"role": "landmark_distances", **(config_extra or {})},
    ).state


def distance_bounds(dists: DataFrame, pairs: DataFrame) -> DataFrame:
    """(u, v, bound): triangle-inequality upper bound per query pair —
    ``min`` over landmarks both endpoints reached of ``d(u,l)+d(l,v)``;
    NULL when no landmark reaches both within the BFS horizon.  Two
    equi-joins + a combiner min: the query set drives the cost, not the
    graph."""
    du = dists.select(
        F.col("bsrc").alias("l"), F.col("id").alias("u"),
        F.col("dist").alias("da"),
    )
    dv = dists.select(
        F.col("bsrc").alias("l"), F.col("id").alias("v"),
        F.col("dist").alias("db"),
    )
    bnd = (
        pairs.join(du, "u")
        .join(dv, ["l", "v"])
        .groupBy("u", "v")
        .agg(F.min(F.col("da") + F.col("db")).alias("bound"))
    )
    return (
        pairs.join(bnd, ["u", "v"], "left")
        .select("u", "v", "bound")
    )
