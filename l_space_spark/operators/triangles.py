"""Triangle counting — degree-ordered wedge join (exact).

The one join shape the reference lacks entirely (SURVEY §2.2): a self-join of
the oriented edge table. Algorithm (node-iterator++ / Schank-Wagner):

1. canonicalize: undirected distinct edges ``(a < b)``, self-loops dropped;
2. orient every edge from the endpoint with (degree, id)-lower rank to the
   higher — for a triangle with ranks r1 < r2 < r3 the oriented edges are
   r1→r2, r1→r3, r2→r3, so it is found exactly once: as the wedge
   (r1→r2, r1→r3) whose closing oriented edge r2→r3 exists;
3. wedges = oriented ⋈ oriented on the common lower vertex, keeping only
   rank(v) < rank(w); triangles = wedges LEFT SEMI JOIN oriented on (v, w).

The degree ordering bounds per-vertex oriented out-degree by O(√|E|) on any
graph, so the wedge join's fan-out stays bounded under power-law skew —
this IS the skew mitigation (no salting needed). Counts are exact; per-vertex
counts credit all three corners.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats


def _canonical(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _oriented(edges: DataFrame) -> DataFrame:
    """Canonical edges oriented by (degree, id) rank: (lo, hi, deg_hi).

    ``deg_hi`` is carried so the wedge join can order its two upper endpoints
    by the same rank without re-joining degrees.
    """
    canon = _canonical(edges)
    deg = (
        canon.select(F.col("a").alias("v"))
        .unionByName(canon.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    with_deg = canon.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_hi"),
    )


def _triangles_of(o: DataFrame) -> DataFrame:
    """(x, y, z) triples from an oriented edge table (each triangle once;
    x = lowest-ranked corner, rank(y) < rank(z))."""
    e1 = o.select(F.col("lo").alias("u"), F.col("hi").alias("v"),
                  F.col("deg_hi").alias("deg_v"))
    e2 = o.select(F.col("lo").alias("u"), F.col("hi").alias("w"),
                  F.col("deg_hi").alias("deg_w"))
    rank_lt = (F.col("deg_v") < F.col("deg_w")) | (
        (F.col("deg_v") == F.col("deg_w")) & (F.col("v") < F.col("w"))
    )
    wedges = e1.join(e2, "u").where(rank_lt).select("u", "v", "w")
    closing = o.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    return wedges.join(closing, ["v", "w"], "left_semi").select(
        F.col("u").alias("x"), F.col("v").alias("y"), F.col("w").alias("z")
    )


def triangle_list(edges: DataFrame) -> DataFrame:
    """Lazy (x, y, z) triangle triples. The oriented table appears three
    times in the plan (two wedge sides + closing edges); callers that
    materialize should prefer `triangle_count`/`triangles_per_vertex`,
    which persist it so canonicalize+degree runs once, not three times."""
    return _triangles_of(_oriented(edges))


def triangle_count(spark: SparkSession, edges: DataFrame) -> int:
    """Exact global triangle count of the undirected simple graph."""
    o = _oriented(edges).persist()
    try:
        return _triangles_of(o).count()
    finally:
        o.unpersist()


def triangles_per_vertex(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """(id, triangles) — number of triangles each vertex participates in.

    Vertices in no triangle get 0. The oriented table is persisted and
    handed to Spark lazily (unpersist happens when the returned frame's
    lineage is dropped — blocks are small: O(|E|) longs).
    """
    o = _oriented(edges).persist()
    tri = _triangles_of(o)
    corners = (
        tri.select(F.col("x").alias("id"))
        .unionByName(tri.select(F.col("y").alias("id")))
        .unionByName(tri.select(F.col("z").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    vertices = (
        o.select(F.col("lo").alias("id"))
        .unionByName(o.select(F.col("hi").alias("id")))
        .distinct()
    )
    return vertices.join(counts, "id", "left").select(
        "id", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )


def clustering_coefficient(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """(id, degree, triangles, lcc_e6) — local clustering coefficient
    ``2·t / (d·(d−1))`` over the undirected simple graph (0 for d < 2),
    as an e6 fixed-point long: integer t and d feed one IEEE multiply/
    divide, so the value is bit-reproducible in SQL.

    Same degree-ordered wedge join as ``triangles_per_vertex`` (the
    O(√E)-bounded orientation), one extra |E|→|V| degree aggregation.
    The standard graph-quality feature (e.g. spam/link-farm detection
    scores on a repo-dependency graph). The result is MATERIALIZED
    before returning (localCheckpoint) so the canonical edge cache can
    be released immediately instead of leaking until context GC.
    """
    canon = _canonical(edges).persist()
    deg = (
        canon.select(F.col("a").alias("id"))
        .unionByName(canon.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangles_per_vertex(spark, canon.select(
        F.col("a").alias("src"), F.col("b").alias("dst")))
    d = F.col("degree").cast("double")
    lcc = F.when(
        F.col("degree") >= 2,
        F.lit(2.0) * F.col("triangles").cast("double") / (d * (d - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    out = deg.join(tri, "id", "left").select(
        "id",
        "degree",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
        F.floor(lcc * F.lit(1e6) + F.lit(0.5)).cast("long").alias("lcc_e6"),
    ).localCheckpoint(eager=True).transform(strip_plan_stats)
    canon.unpersist()
    return out
