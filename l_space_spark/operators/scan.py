"""SCAN — Structural Clustering Algorithm for Networks (Xu, Yuruk, Feng,
Schweiger, KDD 2007) in exact integer arithmetic.

Unlike modularity methods (operators/louvain.py) or label propagation,
SCAN classifies every vertex by the STRUCTURE of its neighborhood:
vertices whose neighborhoods overlap strongly (structural similarity
``σ(u,v) = |Γ(u) ∩ Γ(v)| / sqrt(|Γ(u)| |Γ(v)|)`` with ``Γ`` closed over
the vertex itself) form ε-similar edges; a vertex with ≥ μ ε-similar
neighborhood members (itself included) is a CORE; clusters are the
connected components of the core–core ε-similar subgraph; non-cores in
a core's ε-neighborhood attach as BORDER members; the rest split into
HUBS (adjacent to ≥ 2 clusters — the bridges modularity methods smear
into one community) and OUTLIERS.

Exactness: ε is the rational ``eps_num/eps_den``, so the similarity
test is the pure-integer cross-multiplication
``(cn+2)² · eps_den² ≥ eps_num² · (d(u)+1)(d(v)+1)``
(``cn`` = open common-neighbor count; u and v are each in both closed
neighborhoods, hence the +2) — bit-identical in ANSI SQL, no sqrt.

Scale shape: common-neighbor counts come from the same hub wedge
equi-join as link prediction (operators/linkpred.py:_wedge_common
discipline — Σ deg² bounded by ``max_hub_degree`` when set); the ε
test, core test, and role assignment are combiner-backed groupBys; the
cluster step is the existing scalable hash-min connected-components
superstep over the (much sparser) core–core ε-graph.  Nothing
enumerates non-adjacent pairs.

Reference analog: none in L-space (no community machinery) — this is
the structural-role companion to the Louvain/label-propagation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .components import connected_components, undirect

SCAN_EPS_NUM = 3
SCAN_EPS_DEN = 5
SCAN_MU = 3


def scan_clusters(
    spark: SparkSession,
    edges: DataFrame,
    eps_num: int = SCAN_EPS_NUM,
    eps_den: int = SCAN_EPS_DEN,
    mu: int = SCAN_MU,
    max_hub_degree: int | None = None,
    num_partitions: int | None = None,
    max_iters: int = 50,
) -> DataFrame:
    """(id, cluster, role): SCAN classification of every vertex of the
    simple undirected graph.  ``cluster`` is the min core id of the
    vertex's cluster (hash-min CC label), −1 for hubs/outliers; ``role``
    ∈ {'core', 'border', 'hub', 'outlier'}.  Borders attaching to several
    clusters take the minimum label (deterministic tie-break)."""
    und = undirect(edges).persist()
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    canon = und.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    wedge_src = und
    if max_hub_degree is not None:
        ok = deg.where(F.col("d") <= max_hub_degree).select(
            F.col("id").alias("src")
        )
        wedge_src = und.join(ok, "src", "semi")
    w1 = wedge_src.select(F.col("src").alias("mid"), F.col("dst").alias("u"))
    w2 = wedge_src.select(F.col("src").alias("mid"), F.col("dst").alias("v"))
    common = (
        w1.join(w2, "mid")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    du = deg.select(F.col("id").alias("u"), (F.col("d") + 1).alias("du1"))
    dv = deg.select(F.col("id").alias("v"), (F.col("d") + 1).alias("dv1"))
    ee = (
        canon.join(common, ["u", "v"], "left")
        .select("u", "v", F.coalesce("cn", F.lit(0)).alias("cn"))
        .join(du, "u")
        .join(dv, "v")
    )
    sim = ee.where(
        (F.col("cn") + 2) * (F.col("cn") + 2) * F.lit(eps_den * eps_den)
        >= F.lit(eps_num * eps_num) * F.col("du1") * F.col("dv1")
    ).select("u", "v").persist()
    nsim = (
        sim.select(F.col("u").alias("id"))
        .unionByName(sim.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("nsim"))
    )
    cores = (
        deg.join(nsim, "id", "left")
        .where(F.coalesce("nsim", F.lit(0)) + 1 >= mu)
        .select("id")
        .persist()
    )
    core_u = cores.select(F.col("id").alias("u"))
    core_v = cores.select(F.col("id").alias("v"))
    core_edges = (
        sim.join(core_u, "u", "semi").join(core_v, "v", "semi")
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    cc_res = connected_components(
        spark, core_edges, max_iters=max_iters, resume=False,
        num_partitions=num_partitions,
    )
    if not cc_res.converged:
        # an unconverged hash-min pass would silently leave far cores
        # with non-minimal cluster ids, breaking the "cluster = min core
        # id" contract this function (and its oracle) promises
        raise RuntimeError(
            f"scan_clusters: core-graph hash-min did not converge in "
            f"{max_iters} supersteps; raise max_iters"
        )
    cc = cc_res.state
    # isolated cores (no core–core ε-edge) are their own cluster
    core_rows = (
        cores.join(cc, "id", "left")
        .select(
            "id", F.coalesce("component", F.col("id")).alias("cluster"),
            F.lit("core").alias("role"),
        )
    ).persist()
    # border: non-core endpoint of an ε-edge whose other endpoint is core
    sim_dir = sim.unionByName(
        sim.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    att = (
        sim_dir.join(
            core_rows.select(F.col("id").alias("v"), "cluster"), "v"
        )
        .join(cores.withColumnRenamed("id", "u"), "u", "anti")
        .groupBy(F.col("u").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
        .select("id", "cluster", F.lit("border").alias("role"))
    )
    assigned = core_rows.unionByName(att).persist()
    # hub vs outlier: unassigned vertex adjacent (plain edges) to ≥ 2
    # distinct clusters is a hub; else outlier
    verts = deg.select("id")
    rest = verts.join(assigned.select("id"), "id", "anti")
    nbr_clusters = (
        und.select(F.col("src").alias("id"), F.col("dst").alias("nbr"))
        .join(rest, "id", "semi")
        .join(
            assigned.select(F.col("id").alias("nbr"), "cluster"), "nbr"
        )
        .groupBy("id")
        .agg(F.countDistinct("cluster").alias("nc"))
    )
    rest_rows = (
        rest.join(nbr_clusters, "id", "left")
        .select(
            "id", F.lit(-1).cast("long").alias("cluster"),
            F.when(F.coalesce("nc", F.lit(0)) >= 2, F.lit("hub"))
            .otherwise(F.lit("outlier")).alias("role"),
        )
    )
    return assigned.select(
        "id", F.col("cluster").cast("long").alias("cluster"), "role"
    ).unionByName(rest_rows)
