"""HITS (hubs & authorities) — Kleinberg's mutually-recursive link scores.

Reference analog: none built in (like PageRank, L-space would express the
iteration through ``Repeat`` — ``SyncGuide.scala:516-654``); here it is a
superstep job on the shared runner (plans/superstep.py), so it inherits
checkpoint/resume/metrics.

Per superstep (synchronous, L1-normalized so scores are comparable and the
fixed-point oracle is stable):

    auth'(v) = Σ_{u→v} hub(u)        then  auth ← auth' / Σ auth'
    hub'(u)  = Σ_{u→v} auth(v)       then  hub  ← hub'  / Σ hub'

Scale shape mirrors PageRank: the distinct edge table is repartitioned by
``src`` once and persisted; each superstep shuffles only the |V|-row state
(shuffle_hash hints), plus one dst-keyed pass against the same persisted
table for the hub update. Convergence: L1 delta over (hub, auth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepRunner, SuperstepResult


def hits(
    spark: SparkSession,
    edges: DataFrame,
    max_iters: int = 20,
    tol: float = 1e-6,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id long, hub double, auth
    double)``. ``tol <= 0`` = fixed-iteration (oracle-comparable) mode."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    links = (
        edges.select("src", "dst").where(F.col("src") != F.col("dst"))
        .distinct().repartition(num_partitions, "src").persist()
    )
    vertices = (
        links.select(F.col("src").alias("id"))
        .unionByName(links.select(F.col("dst").alias("id")))
        .distinct().persist()
    )
    n = vertices.count()
    if n == 0:
        return SuperstepResult(
            vertices.withColumn("hub", F.lit(0.0)).withColumn("auth", F.lit(0.0)),
            0, True, [], [],
        )

    init = vertices.select(
        "id", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")
    )
    fixed_iters = tol <= 0

    def _normalized(df: DataFrame, col: str) -> DataFrame:
        total = df.agg(F.sum(col).alias("__t"))
        return df.crossJoin(F.broadcast(total)).select(
            *[c for c in df.columns if c != col],
            (F.col(col) / F.col("__t")).alias(col),
        )

    def step(state: DataFrame, i: int) -> DataFrame:
        araw = (
            state.hint("shuffle_hash")
            .join(links, state["id"] == links["src"])
            .groupBy("dst").agg(F.sum("hub").alias("a"))
        )
        auth = vertices.join(
            araw.hint("shuffle_hash"), vertices["id"] == araw["dst"], "left"
        ).select(vertices["id"], F.coalesce(F.col("a"), F.lit(0.0)).alias("auth"))
        auth = _normalized(auth, "auth")
        hraw = (
            auth.hint("shuffle_hash")
            .join(links, auth["id"] == links["dst"])
            .groupBy("src").agg(F.sum("auth").alias("h"))
        )
        hub = vertices.join(
            hraw.hint("shuffle_hash"), vertices["id"] == hraw["src"], "left"
        ).select(vertices["id"], F.coalesce(F.col("h"), F.lit(0.0)).alias("hub"))
        hub = _normalized(hub, "hub")
        return hub.join(auth, "id").select("id", "hub", "auth")

    def l1_delta(old: DataFrame, new: DataFrame) -> float:
        return float(
            new.alias("n").join(old.alias("o"), "id")
            .agg(F.sum(
                F.abs(F.col("n.hub") - F.col("o.hub"))
                + F.abs(F.col("n.auth") - F.col("o.auth"))
            )).first()[0]
        )

    runner = SuperstepRunner(
        spark,
        max_iters=max_iters,
        tol=tol if not fixed_iters else -1.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "hits", "fixed_iters": max_iters if fixed_iters else None,
                **(config_extra or {})},
    )
    try:
        result = runner.run(
            init, step, metric_fn=None if fixed_iters else l1_delta,
            resume=resume,
        )
    finally:
        links.unpersist()
        vertices.unpersist()
    return result
