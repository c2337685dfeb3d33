"""Table loaders + derived edge graphs over the driver's parquet testdata.

The reference's storage layer proves that a graph at scale is a partitioned
edge table (Cassandra provider's sharded edge tables,
``store/cassandra/.../CassandraGraphTables.scala:7-21``); these helpers derive
deterministic edge tables from relational inputs. An Iceberg catalog would
swap ``spark.read.parquet`` for ``spark.table`` — same layout, partition
pruning + snapshots for free (SURVEY §4.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def customer_supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite customer→supplier edge table via orders ⋈ lineitem.

    Vertex ids are disjoint: customer = 2·custkey, supplier = 2·suppkey+1.
    All suppliers are dangling (no out-edges) — deliberately exercises
    PageRank's dangling-mass redistribution.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )


CUSTOMER_SUPPLIER_EDGES_SQL = """
SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
""".strip()


def chain_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse multi-component chain graph keyed off customer ids."""
    c = load(spark, sf_dir, "customer")
    return c.where(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("src"),
        (F.col("c_custkey") + F.col("c_custkey") % 7 + 1).alias("dst"),
    )


CHAIN_EDGES_SQL = """
SELECT c_custkey AS src, c_custkey + (c_custkey % 7) + 1 AS dst
FROM customer WHERE c_custkey % 3 = 0
""".strip()


MOD_N = 100


def mod_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic RANDOM graph on MOD_N vertices, two edges per customer
    row, endpoints drawn with the portable md5 hash (reproducible in SQL).

    Linear congruential endpoints (the first cut) are structurally
    triangle-FREE — a triangle needs a multiplicative identity mod N that
    never holds — so the triangle queries were passing on 0 == 0. A hashed
    G(n, m) graph has expected triangle count ~(4/3)(m/n)³ at sf0.001 and
    is near-complete at sf0.1 (~160 k triangles): the wedge join actually
    gets exercised.
    """
    c = load(spark, sf_dir, "customer").select("c_custkey")
    n = F.lit(MOD_N)

    def h(tag: str) -> F.Column:
        key = F.concat(F.lit(f"{tag}:"), F.col("c_custkey").cast("string"))
        return F.pmod(
            F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long"), n
        )

    return c.select(h("a").alias("src"), h("b").alias("dst")).unionByName(
        c.select(h("c").alias("src"), h("d").alias("dst"))
    )


def _h_sql(tag: str) -> str:
    return (
        f"(('0x' || substr(md5('{tag}:' || c_custkey::VARCHAR), 1, 15))::BIGINT"
        f" % {MOD_N})"
    )


MOD_EDGES_SQL = f"""
SELECT {_h_sql("a")} AS src, {_h_sql("b")} AS dst FROM customer
UNION ALL
SELECT {_h_sql("c")}, {_h_sql("d")} FROM customer
""".strip()


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    buckets: int = 16,
    path: str | None = None,
    sort: bool = True,
) -> str:
    """Persist an edge table BUCKETED by ``src`` — the layout the
    reference's own storage layer gropes toward with its pre-sharded
    Cassandra edge tables (``CassandraGraphTables.scala:7-21``), done
    properly: downstream joins and aggregations keyed on ``src`` read the
    bucketing from the catalog and skip their shuffle entirely
    (tests/test_plans.py pins this). At cluster scale this is the Iceberg
    ``bucket(N, src)`` partition transform; bucket count should match the
    superstep shuffle partitioning so graph jobs co-locate for free.
    """
    w = edges.write.mode("overwrite").format("parquet").bucketBy(buckets, "src")
    if sort:
        w = w.sortBy("src")
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
    return table


def delete_where(spark: SparkSession, path: str, condition) -> int:
    """Drop-step sink (reference ``step/Drop.scala:7`` — unimplemented even
    there, ``AsyncGuideSpec.scala:685-692``): delete the rows matching
    ``condition`` from a parquet table by rewrite.

    Parquet has no row-level deletes, so this is the copy-on-write path —
    read, anti-filter, write to a staging dir, atomic directory swap. On
    Iceberg this whole function collapses to ``MERGE INTO … WHEN MATCHED
    THEN DELETE`` (position/equality deletes, no full rewrite); the
    rewrite here is the layout-preserving fallback and is how parquet
    lakes did it before deletion vectors. Returns rows deleted.
    """
    import shutil
    import uuid

    df = spark.read.parquet(path)
    total = df.count()
    # keep every row where the predicate is NOT TRUE — three-valued logic:
    # a NULL predicate (e.g. `col == 0` on a NULL col) must KEEP the row,
    # not silently delete it (`~NULL` is NULL and would be filtered out)
    kept = df.where(~F.coalesce(condition, F.lit(False)))
    staging = f"{path.rstrip('/')}__staging_{uuid.uuid4().hex[:8]}"
    kept.write.mode("overwrite").parquet(staging)
    n_kept = spark.read.parquet(staging).count()
    backup = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    shutil.move(path, backup)
    shutil.move(staging, path)
    shutil.rmtree(backup)
    return total - n_kept
