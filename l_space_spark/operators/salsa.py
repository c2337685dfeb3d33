"""SALSA — Stochastic Approach for Link-Structure Analysis.

Lempel & Moran 2000: HITS with the mutual reinforcement replaced by a
RANDOM WALK, which makes it robust to the tightly-knit-community
effect and is the ranker behind Twitter's who-to-follow work (Gupta et
al. 2013). Two independent two-step walks on the directed graph:

    authority walk:  a'(k) = Σ_{i→k} 1/out(i) · Σ_{i→j} a(j)/in(j)
    hub walk:        h'(u) = Σ_{u→j} 1/in(j)  · Σ_{i→j} h(i)/out(i)

i.e. from an authority, step BACK along a uniform in-link to a hub,
then FORWARD along a uniform out-link to an authority (and the mirror
image for hubs). Both transition matrices are stochastic, so mass is
conserved; scores are L1-renormalized every superstep anyway (the HITS
convention here) purely to pin down float drift for the e6 fixed-point
oracle gate. Fixed-iteration mode (``tol <= 0``) is the
oracle-comparable twin of the unrolled SQL in queries.py.

Scale shape mirrors ``hits``/``pagerank``: the distinct edge table is
enriched ONCE with both endpoint degrees (1/in(dst), 1/out(src)),
repartitioned by ``src`` and persisted; every superstep shuffles only
the |V|-row state through four hash joins (gather on dst, scatter on
src per walk). The per-edge division happens on the |V|-row state
BEFORE the edge join (one divide per vertex, not per edge), so the
groupBy sums are plain combiner-backed aggregates and skew behaves
exactly like PageRank's (AQE/salting notes in operators/pagerank.py
apply unchanged).

Reference analog: none — like PageRank/HITS, the reference could only
spell this as a ``Repeat`` of manual moves (``SyncGuide.scala:516``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from ..plans.superstep import SuperstepResult, SuperstepRunner


def salsa(
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
    double)`` — auth lives on vertices with in-degree ≥ 1, hub on
    vertices with out-degree ≥ 1, 0.0 elsewhere."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    links = (
        edges.select("src", "dst").where(F.col("src") != F.col("dst"))
        .distinct().repartition(num_partitions, "src").persist()
    )
    indeg = links.groupBy("dst").agg(F.count(F.lit(1)).alias("ind"))
    outdeg = links.groupBy("src").agg(F.count(F.lit(1)).alias("outd"))
    vertices = (
        links.select(F.col("src").alias("id"))
        .unionByName(links.select(F.col("dst").alias("id")))
        .distinct()
        .join(indeg.select(F.col("dst").alias("id"), "ind"), "id", "left")
        .join(outdeg.select(F.col("src").alias("id"), "outd"), "id", "left")
        .select(
            "id",
            F.coalesce("ind", F.lit(0)).alias("ind"),
            F.coalesce("outd", F.lit(0)).alias("outd"),
        )
        .persist()
    )
    counts = vertices.agg(
        F.sum((F.col("ind") > 0).cast("long")).alias("na"),
        F.sum((F.col("outd") > 0).cast("long")).alias("nh"),
    ).first()
    na, nh = int(counts["na"] or 0), int(counts["nh"] or 0)
    if na == 0:  # no edges at all (nh == 0 too)
        state = vertices.select(
            "id", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")
        ).localCheckpoint(eager=True).transform(strip_plan_stats)
        links.unpersist()
        vertices.unpersist()
        return SuperstepResult(state, 0, True, [], [])

    init = vertices.select(
        "id",
        "ind",
        "outd",
        F.when(F.col("outd") > 0, F.lit(1.0 / nh)).otherwise(F.lit(0.0))
        .alias("hub"),
        F.when(F.col("ind") > 0, F.lit(1.0 / na)).otherwise(F.lit(0.0))
        .alias("auth"),
    )

    def _renorm(df: DataFrame, col: str) -> DataFrame:
        total = df.agg(F.sum(col).alias("__t"))
        return df.crossJoin(F.broadcast(total)).select(
            *[c for c in df.columns if c != col],
            (F.col(col) / F.col("__t")).alias(col),
        )

    def _two_step(
        state: DataFrame, col: str, first_on: str, second_on: str
    ) -> DataFrame:
        """One walk step: gather state[col]/deg along ``first_on``
        (dst for auth, src for hub), scatter /deg along the other."""
        gdeg = "ind" if first_on == "dst" else "outd"
        contrib = state.select(
            F.col("id").alias(first_on),
            (F.col(col) / F.col(gdeg)).alias("_c"),
        ).where(F.col(gdeg) > 0)
        mid = (
            contrib.hint("shuffle_hash")
            .join(links, first_on)
            .groupBy(F.col(second_on).alias("_m"))
            .agg(F.sum("_c").alias("_mass"))
        )
        # scatter: divide the gathered hub/authority mass by ITS degree
        middeg = indeg if second_on == "dst" else outdeg
        mid = mid.join(
            middeg.select(F.col(second_on).alias("_m"),
                          F.col("ind" if second_on == "dst" else "outd")
                          .alias("_d")),
            "_m",
        ).select(F.col("_m").alias(second_on),
                 (F.col("_mass") / F.col("_d")).alias("_c2"))
        out = (
            mid.hint("shuffle_hash")
            .join(links, second_on)
            .groupBy(F.col(first_on).alias("id"))
            .agg(F.sum("_c2").alias("_new"))
        )
        return out  # (id, _new) on the `first_on`-side vertex set

    def step(state: DataFrame, i: int) -> DataFrame:
        anew = _two_step(state, "auth", "dst", "src")
        hnew = _two_step(state, "hub", "src", "dst")
        nxt = (
            vertices.join(anew.hint("shuffle_hash"), "id", "left")
            .withColumnRenamed("_new", "auth")
            .join(hnew.hint("shuffle_hash"), "id", "left")
            .withColumnRenamed("_new", "hub")
            .select(
                "id", "ind", "outd",
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("auth", F.lit(0.0)).alias("auth"),
            )
        )
        nxt = _renorm(nxt, "auth")
        return _renorm(nxt, "hub")

    def metric(old: DataFrame, new: DataFrame) -> float:
        j = old.select("id", F.col("auth").alias("a0"),
                       F.col("hub").alias("h0")).join(new, "id")
        row = j.agg(
            F.sum(F.abs(F.col("auth") - F.col("a0"))
                  + F.abs(F.col("hub") - F.col("h0"))).alias("d")
        ).first()
        return float(row["d"] or 0.0)

    runner = SuperstepRunner(
        spark,
        max_iters=max_iters,
        tol=tol,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "salsa", **(config_extra or {})},
    )
    try:
        res = runner.run(
            init, step, metric_fn=None if tol <= 0 else metric,
            resume=resume,
        )
    finally:
        links.unpersist()
        vertices.unpersist()
    res.state = res.state.select("id", "hub", "auth")
    return res
