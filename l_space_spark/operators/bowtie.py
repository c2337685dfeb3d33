"""Bow-tie decomposition — the web-graph macro-structure census.

Broder et al. (WWW 2000) showed the web's link graph organizes around its
largest strongly connected component: ``core`` (the giant SCC), ``in``
(reaches the core), ``out`` (reachable from the core), ``tube`` (on an
in→out path bypassing the core), ``tendril`` (hangs off ``in`` forward or
off ``out`` backward, never touching the core), and ``disconnected``.
This is the first analysis anyone runs on a crawled link graph, and it is
pure composition of primitives this engine already ships:

1. SCC labelling (``operators/scc.py``) → pick the largest component
   deterministically by (size DESC, component-id ASC);
2. four directed reachability fixpoints, each a binary min-label
   propagation over one edge orientation — literally ``scc._propagate_min``
   with a 0/1 seed vector (0 = in the seed set):
   forward/backward from the core (→ ``out`` / ``in``), forward from
   ``in`` and backward from ``out`` (→ tube vs tendril vs disconnected).

Scale shape: every step is the connected-components superstep shape —
|V|-row label frontier joined against the edge table on its partition
key, combiner-backed min aggregation, diameter-bounded with early-exit —
plus one groupBy + a single driver scalar for the core pick (same
discipline as PageRank's dangling-mass read). Nothing here is new
machinery at 100×; it inherits the components/scc plans.

Reference analog: none — the reference has no graph algorithms; its
closest idiom is chained ``out()``/``in()`` Repeat traversals
(``core/.../step/Out.scala``, ``step/In.scala``) with client-side set
algebra, which is exactly what this barrier-aggregated form replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from .scc import _propagate_min, strongly_connected_components


def _flag(verts: DataFrame, seed: DataFrame) -> DataFrame:
    """(id, lab) with lab = 0 on ``seed`` ids, 1 elsewhere."""
    return verts.join(
        seed.withColumn("_s", F.lit(0)), "id", "left"
    ).select("id", F.coalesce("_s", F.lit(1)).alias("lab"))


def bowtie_classes(
    spark: SparkSession,
    edges: DataFrame,
    max_iters: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns ``(id, cls)`` with cls ∈ {core, in, out, tube, tendril,
    disconnected} for every non-isolated vertex of the directed graph."""
    links = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    if num_partitions:
        links = links.repartition(num_partitions, "src")
    links = links.persist()
    # localCheckpoint (not persist): verts feeds the RETURNED plan, so a
    # persist could never be freed before the caller materializes; the
    # checkpoint truncates lineage and its blocks are reclaimed by the
    # ContextCleaner when the result is dropped
    verts = (
        links.select(F.col("src").alias("id"))
        .union(links.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True).transform(strip_plan_stats)
    )

    if verts.limit(1).count() == 0:  # self-loop-only / empty input
        links.unpersist()
        return spark.createDataFrame([], "id long, cls string")

    try:
        scc = strongly_connected_components(
            spark, links, resume=False, num_partitions=num_partitions
        ).state.select("id", "scc")
        # largest SCC, deterministic tie-break on the component id
        top = (
            scc.groupBy("scc").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("scc").asc())
            .limit(1)
            .collect()
        )
        core_id = top[0]["scc"]
        core = scc.where(F.col("scc") == F.lit(core_id)).select("id")

        def reached(seed: DataFrame, a: str, b: str) -> DataFrame:
            out = _propagate_min(_flag(verts, seed), links, a, b, max_iters)
            # truncate lineage: each fixpoint's logical plan otherwise feeds
            # the NEXT propagation's seed and the final 5-way classification
            # join, and the composed plan tree grows multiplicatively (AQE
            # re-plans + explain-string building blew the driver heap on the
            # un-truncated version at sf0.01)
            return (out.where(F.col("lab") == 0).select("id")
                    .localCheckpoint(eager=True).transform(strip_plan_stats))

        core = core.localCheckpoint(eager=True).transform(strip_plan_stats)
        fwd = reached(core, "src", "dst")          # core ∪ out
        bwd = reached(core, "dst", "src")          # core ∪ in
        out_set = fwd.join(core, "id", "anti").localCheckpoint(eager=True).transform(strip_plan_stats)
        in_set = bwd.join(core, "id", "anti").localCheckpoint(eager=True).transform(strip_plan_stats)
        from_in = reached(in_set, "src", "dst")    # in ∪ reachable-from-in
        to_out = reached(out_set, "dst", "src")    # out ∪ reaches-out
    finally:
        # all consumers of links (scc + the four fixpoints) are checkpoint-
        # truncated above — the returned plan never re-reads it
        links.unpersist()

    cls = (
        verts
        .join(core.withColumn("_c", F.lit(1)), "id", "left")
        .join(in_set.withColumn("_i", F.lit(1)), "id", "left")
        .join(out_set.withColumn("_o", F.lit(1)), "id", "left")
        .join(from_in.withColumn("_fi", F.lit(1)), "id", "left")
        .join(to_out.withColumn("_to", F.lit(1)), "id", "left")
        .select(
            "id",
            F.when(F.col("_c") == 1, F.lit("core"))
            .when(F.col("_i") == 1, F.lit("in"))
            .when(F.col("_o") == 1, F.lit("out"))
            .when((F.col("_fi") == 1) & (F.col("_to") == 1), F.lit("tube"))
            .when((F.col("_fi") == 1) | (F.col("_to") == 1),
                  F.lit("tendril"))
            .otherwise(F.lit("disconnected"))
            .alias("cls"),
        )
    )
    return cls
