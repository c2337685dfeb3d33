"""Deterministic random walks — the graph-embedding sampler (DeepWalk /
node2vec input stage), expressed as L equi-join supersteps.

Each walk advances by choosing, among the current vertex's out-neighbors,
the one minimizing the portable 60-bit hash of
``(seed, start, replicate, step, candidate)`` — a fixed pseudo-random
draw that is (a) uniform over neighbors in distribution, (b) independent
across walks and steps, and (c) bit-reproducible in ANSI SQL, so the
whole operator gets an exact DuckDB oracle (the same reason MinHash/
SimHash use this hash, ``queries.py`` module doc). Walks that reach a
sink (no out-edges) simply end early, like the reference's ``Repeat``
loop running out of moves (``step/Repeat.scala:100`` — a frontier row
with no join match drops out).

Walk identity is the explicit ``(start, r)`` column pair, NOT a
composite ``start * n_walks + r`` id: the engine's vertex ids are
full-width signed xxhash64 values (``extract.py``), so the composite
multiply overflows long for real graphs (caught by the spark-submit
verify drive) and its div/pmod decode is wrong for negative ids.

Scale shape: one step = frontier ⋈ edges equi-join on ``src`` (the edge
table is repartitioned by ``src`` once and persisted; only the
|walks|-row frontier shuffles per step) followed by a map-side-combinable
``groupBy(start, r).min(struct(h, dst))`` — no windows, no skew pileup
(the per-walk candidate set is the out-degree of one vertex, and the
min-struct aggregation combines partials before the shuffle).

``biased_walks`` is the node2vec second-order sampler (Grover &
Leskovec 2016) on the same plan: each candidate's unnormalized weight
depends on its relation to the PREVIOUS vertex — return (dist 0),
common neighbor (dist 1), or exploration (dist 2) — with the p/q bias
expressed as an INTEGER weight triple and realized by the integer
replica race (explode ``w`` replicas per candidate, hash each, argmin
over all replicas — ``sampling.weighted_sample_per_group``'s trick),
NOT Efraimidis–Spirakis ``u^(1/w)`` keys: ``pow`` is a libm call whose
last-ulp behavior differs across engines and would break the exact
oracle. The distance-1 test is one LEFT JOIN against the undirected
pair set per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from ..functions.text import hash60


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    walk_length: int = 5,
    n_walks: int = 1,
    seed: str = "walk",
    starts: DataFrame | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns ``(start long, r int, step int, vertex long)`` rows.

    One walk per (start vertex × ``n_walks`` replicate); the hash
    stream is keyed by ``(start, r)`` so replicate walks draw
    independent draws. ``starts`` defaults to every vertex appearing in
    ``edges``. ``step`` 0 is the start vertex; a walk shorter than
    ``walk_length`` hit a sink.
    """
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    e = (
        edges.select("src", "dst").distinct()
        .repartition(num_partitions, "src")
        .persist()
    )
    if starts is None:
        starts = e.select(F.col("src").alias("id")).unionByName(
            e.select(F.col("dst").alias("id"))
        ).distinct()
    else:
        starts = starts.select("id").distinct()
    starts = starts.localCheckpoint(eager=True).transform(strip_plan_stats)

    frontier = starts.select(
        "id", F.explode(F.sequence(F.lit(0), F.lit(n_walks - 1))).alias("r")
    ).select(
        F.col("id").alias("start"), "r", F.col("id").alias("cur")
    )
    out = frontier.select(
        "start", "r", F.lit(0).alias("step"), F.col("cur").alias("vertex")
    )
    steps = [out]

    for k in range(1, walk_length + 1):
        cand = frontier.hint("shuffle_hash").join(
            e, frontier["cur"] == e["src"]
        ).select(
            "start",
            "r",
            "dst",
            hash60(
                F.concat_ws(
                    ":",
                    F.lit(seed),
                    F.col("start").cast("string"),
                    F.col("r").cast("string"),
                    F.lit(str(k)),
                    F.col("dst").cast("string"),
                )
            ).alias("h"),
        )
        frontier = (
            cand.groupBy("start", "r")
            .agg(F.min(F.struct("h", "dst")).alias("m"))
            .select("start", "r", F.col("m.dst").alias("cur"))
            .localCheckpoint(eager=True).transform(strip_plan_stats)
        )
        steps.append(
            frontier.select(
                "start", "r", F.lit(k).alias("step"),
                F.col("cur").alias("vertex"),
            )
        )

    e.unpersist()  # every steps[k] is (derived from) a localCheckpoint
    result = steps[0]
    for s in steps[1:]:
        result = result.unionByName(s)
    return result


def biased_walks(
    spark: SparkSession,
    edges: DataFrame,
    walk_length: int = 5,
    n_walks: int = 1,
    w_ret: int = 1,
    w_near: int = 4,
    w_far: int = 16,
    seed: str = "n2v",
    starts: DataFrame | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """node2vec-style second-order biased walks (module doc). The
    weight triple maps to node2vec (p, q) as ``w_ret ∝ 1/p, w_near ∝ 1,
    w_far ∝ 1/q`` scaled to integers — the default (1, 4, 16) is
    (p, q) = (4, 1/4), the exploration-leaning setting. Step 1 has no
    previous vertex and is uniform, as in the reference algorithm.
    Returns ``(start long, r int, step int, vertex long)``."""
    if min(w_ret, w_near, w_far) < 1:
        raise ValueError("weights must be positive integers")
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    e = (
        edges.select("src", "dst").distinct()
        .repartition(num_partitions, "src")
        .persist()
    )
    upair = e.select(
        F.least("src", "dst").alias("ua"), F.greatest("src", "dst").alias("ub")
    ).distinct().persist()
    if starts is None:
        starts = e.select(F.col("src").alias("id")).unionByName(
            e.select(F.col("dst").alias("id"))
        ).distinct()
    else:
        starts = starts.select("id").distinct()
    starts = starts.localCheckpoint(eager=True).transform(strip_plan_stats)

    frontier = starts.select(
        "id", F.explode(F.sequence(F.lit(0), F.lit(n_walks - 1))).alias("r")
    ).select(
        F.col("id").alias("start"), "r",
        F.col("id").alias("prev"), F.col("id").alias("cur"),
    )
    steps = [frontier.select(
        "start", "r", F.lit(0).alias("step"), F.col("cur").alias("vertex")
    )]

    def _h(k: int, extra: list) -> F.Column:
        return hash60(F.concat_ws(
            ":", F.lit(seed), F.col("start").cast("string"),
            F.col("r").cast("string"), F.lit(str(k)),
            *[c.cast("string") for c in extra],
        ))

    for k in range(1, walk_length + 1):
        cand = frontier.hint("shuffle_hash").join(
            e, frontier["cur"] == e["src"]
        ).select("start", "r", "prev", F.col("cur").alias("c0"), "dst")
        if k == 1:
            scored = cand.select(
                "start", "r", "c0", "dst",
                _h(k, [F.col("dst")]).alias("h"),
                F.lit(1).alias("j"),
            )
        else:
            near = cand.join(
                upair,
                (upair["ua"] == F.least("prev", "dst"))
                & (upair["ub"] == F.greatest("prev", "dst")),
                "left",
            ).select(
                "start", "r", "prev", "c0", "dst",
                F.when(F.col("dst") == F.col("prev"), F.lit(w_ret))
                .when(F.col("ua").isNotNull(), F.lit(w_near))
                .otherwise(F.lit(w_far)).alias("w"),
            )
            scored = near.select(
                "start", "r", "c0", "dst",
                F.explode(F.sequence(F.lit(1), F.col("w"))).alias("j"),
            )
            scored = scored.select(
                "start", "r", "c0", "dst", "j",
                _h(k, [F.col("dst"), F.col("j")]).alias("h"),
            )
        frontier = (
            scored.groupBy("start", "r")
            .agg(F.min(F.struct("h", "dst", "j")).alias("m"),
                 F.first("c0").alias("prev"))
            .select("start", "r", "prev", F.col("m.dst").alias("cur"))
            .localCheckpoint(eager=True).transform(strip_plan_stats)
        )
        steps.append(frontier.select(
            "start", "r", F.lit(k).alias("step"), F.col("cur").alias("vertex")
        ))

    e.unpersist()
    upair.unpersist()
    result = steps[0]
    for s in steps[1:]:
        result = result.unionByName(s)
    return result


def skipgram_pairs(
    walks: DataFrame,
    window: int = 2,
) -> DataFrame:
    """(center, context) co-occurrence counts from walk rows — the
    word2vec/node2vec training-pair extraction: for every walk, each
    ordered pair of positions at distance 1..``window`` yields one
    (center, context) observation; pairs are aggregated to counts
    (the downstream negative-sampling loader consumes frequencies, not
    the raw stream).

    Relational shape: one self-equi-join of the walk table on the walk
    identity (start, r) with a bounded step-distance predicate, then a
    combiner-backed count — no windows, no UDF. The join fan-out is
    walk_length·window per walk, a constant multiple of the input.
    Returns ``(center long, context long, n long)``.
    """
    a = walks.select(
        "start", "r", F.col("step").alias("i"), F.col("vertex").alias("center")
    )
    b = walks.select(
        "start", "r", F.col("step").alias("j"), F.col("vertex").alias("context")
    )
    return (
        a.join(b, ["start", "r"])
        .where(
            (F.col("i") != F.col("j"))
            & (F.abs(F.col("i") - F.col("j")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
