"""PageRank — power iteration with damping and dangling-mass redistribution.

The reference (L-space) has no built-in PageRank; its iterative primitive is
the ``Repeat`` step (``core/.../librarian/task/SyncGuide.scala:516-654``),
which this module instantiates as a superstep loop of DataFrame jobs
(plans/superstep.py).

Update rule (synchronous, per superstep t):

    r_{t+1}(v) = (1-d)/n + d * ( Σ_{u→v} r_t(u) / outdeg(u)  +  m_t / n )

where ``m_t = Σ_{u: outdeg(u)=0} r_t(u)`` is the dangling mass. Σr = 1 is
preserved every superstep (asserted in tests). Convergence: L1 delta
``Σ|r_{t+1} − r_t| ≤ tol``.

Two physical strategies:

- ``impl="dataframe"`` (default): contributions via an equi-join
  ``ranks ⋈ links ON id = src`` followed by ``groupBy(dst).sum``. ``links``
  is pre-joined with out-degree weights, hash-repartitioned by ``src`` and
  persisted ONCE; ranks emerge from the previous superstep's
  ``groupBy(dst)`` hash-partitioned on the same key count, so Catalyst
  reuses the partitioning and each superstep shuffles only the rank table
  (|V| rows), never the edge table (|E| rows). AQE handles residual skew.

- ``impl="csr"``: the vectorized-kernel path from the north star — ranks and
  links are cogrouped on ``block = pmod(src, P)`` and a numpy kernel
  (sort + ``np.add.reduceat``) computes per-block partial sums per ``dst``
  (map-side combine in user space), so the downstream shuffle carries at most
  P × |distinct dst| pre-aggregated rows instead of |E| contribution rows.
  At high average degree this is the scale path; Arrow moves the batches.

Skew: very high in-degree vertices make ``groupBy(dst)`` hot. The CSR kernel
pre-aggregates per block which bounds any single reducer's input to P rows
per hot key; for the dataframe impl, AQE skew handling plus the optional
``salt`` parameter (two-phase aggregation on ``(dst, salt)``) covers it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepRunner, SuperstepResult


def _dsum(col):
    """Deterministic double sum: collect → sort → fold.

    Spark's ``sum`` merges partial aggregates in task-completion order, which
    is nondeterministic across runs and yields 1-ulp drift — fine for the
    1e-6 gate, fatal for byte-identical resume (FIXTURES F5). Sorting the
    values first pins the fp summation order. Costs a per-group array
    materialization, so it's opt-in (``deterministic=True``).
    """
    return F.aggregate(
        F.array_sort(F.collect_list(col)), F.lit(0.0), lambda acc, x: acc + x
    )


def prepare_links(
    edges: DataFrame, num_partitions: int | None = None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """edges(src, dst, …) → (links(src, dst, w), vertices(id), dangling(id)).

    ``w = 1/outdeg(src)`` over the DISTINCT edge set (parallel edges count
    once, matching the oracle definition).
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    if num_partitions:
        e = e.repartition(num_partitions, "src")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    links = e.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w")
    )
    vertices = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    dangling = vertices.join(
        e.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    )
    return links, vertices, dangling


def _csr_contribs(
    ranks: DataFrame, links: DataFrame, num_partitions: int
) -> DataFrame:
    """Per-block vectorized partial contributions via cogroup + numpy kernel."""
    p = F.lit(num_partitions)
    r = ranks.withColumn("block", F.pmod(F.col("id"), p))
    l = links.withColumn("block", F.pmod(F.col("src"), p))

    def kernel(rpdf: pd.DataFrame, lpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({"dst": pd.Series(dtype="int64"),
                                 "contrib": pd.Series(dtype="float64")})
        # rank lookup for this block's sources (CSR-style gather)
        rank_of = pd.Series(rpdf["rank"].to_numpy(), index=rpdf["id"].to_numpy())
        vals = rank_of.reindex(lpdf["src"].to_numpy()).to_numpy() * lpdf["w"].to_numpy()
        dst = lpdf["dst"].to_numpy()
        order = np.argsort(dst, kind="stable")
        dst_s, vals_s = dst[order], vals[order]
        uniq, starts = np.unique(dst_s, return_index=True)
        sums = np.add.reduceat(vals_s, starts)
        return pd.DataFrame({"dst": uniq, "contrib": sums})

    partial = r.groupBy("block").cogroup(l.groupBy("block")).applyInPandas(
        kernel, schema="dst long, contrib double"
    )
    return partial.groupBy("dst").agg(F.sum("contrib").alias("contrib"))


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 100,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    impl: str = "dataframe",
    salt: int | None = None,
    deterministic: bool = False,
    resume: bool = True,
    fuse: int = 1,
) -> SuperstepResult:
    """Run PageRank to convergence (or exactly ``max_iters`` when ``tol <= 0``).

    Returns a SuperstepResult whose ``state`` is ``(id long, rank double)``.
    ``tol <= 0`` selects fixed-iteration mode and skips the per-superstep
    delta job (one job per superstep instead of two) — this is the
    oracle-comparable deterministic mode.
    """
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    links, vertices, dangling = prepare_links(edges, num_partitions)
    links = links.persist()
    vertices = vertices.persist()
    dangling = dangling.select("id").persist()
    n = vertices.count()
    if n == 0:
        return SuperstepResult(
            vertices.withColumn("rank", F.lit(0.0)), 0, True, [], []
        )

    init = vertices.select("id", F.lit(1.0 / n).alias("rank"))
    fixed_iters = tol <= 0

    sum_fn = _dsum if deterministic else F.sum

    def step(ranks: DataFrame, i: int) -> DataFrame:
        # dangling mass as a broadcast ONE-ROW DataFrame, not a collected
        # scalar: the whole superstep stays lazy (no driver action), which
        # lets the runner fuse `materialize_every` rounds into one job
        mass_df = ranks.join(dangling, "id", "left_semi").agg(
            F.coalesce(sum_fn(F.col("rank")), F.lit(0.0)).alias("__mass")
        )

        if impl == "csr":
            contribs = _csr_contribs(ranks, links, num_partitions)
        elif salt:
            joined = ranks.join(links, ranks["id"] == links["src"]).select(
                "dst",
                (F.col("rank") * F.col("w")).alias("c"),
                F.pmod(F.xxhash64("id", F.lit(i)), F.lit(salt)).alias("s"),
            )
            partial = joined.groupBy("dst", "s").agg(F.sum("c").alias("c"))
            contribs = partial.groupBy("dst").agg(F.sum("c").alias("contrib"))
        else:
            # shuffle_hash hint: |V|-row tables fit under the broadcast
            # threshold, but broadcasting ranks every superstep serializes on
            # the driver (collect+build+ship per round — a hard scaling
            # ceiling). A shuffled hash join moves only the |V|-row rank
            # table; the |E|-row links side reuses its persisted src-hash
            # partitioning and never re-shuffles.
            contribs = (
                ranks.hint("shuffle_hash")
                .join(links, ranks["id"] == links["src"])
                .groupBy("dst")
                .agg(sum_fn(F.col("rank") * F.col("w")).alias("contrib"))
            )

        return (
            vertices.join(contribs.hint("shuffle_hash"),
                          vertices["id"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(mass_df))
            .select(
                vertices["id"],
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("__mass") / F.lit(float(n))
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )

    def l1_delta(old: DataFrame, new: DataFrame) -> float:
        return float(
            new.alias("n")
            .join(old.alias("o"), "id")
            .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))))
            .first()[0]
        )

    runner = SuperstepRunner(
        spark,
        max_iters=max_iters,
        tol=tol if not fixed_iters else -1.0,
        checkpoint_dir=checkpoint_dir,
        # ``fuse`` k>1: in fixed-iteration mode, fuse k supersteps into one
        # plan (no per-round action). CAVEAT: each round's dangling-mass
        # broadcast subquery re-evaluates the unmaterialized previous round,
        # so fusion duplicates subtree work ~2^k — a win only when the graph
        # is small enough that per-job overhead dominates compute (e.g. the
        # sf0.01 gate), never at scale. Default 1 = materialize each round.
        materialize_every=fuse if fixed_iters else 1,
        config={
            "algo": "pagerank",
            "damping": damping,
            "impl": impl,
            "deterministic": deterministic,
            "fixed_iters": max_iters if fixed_iters else None,
        },
    )
    result = runner.run(
        init, step, metric_fn=None if fixed_iters else l1_delta, resume=resume
    )
    links.unpersist()
    dangling.unpersist()
    vertices.unpersist()
    return result
