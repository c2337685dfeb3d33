"""Deterministic per-group capped sampling — "at most N documents per
domain", the quota/stratification stage of a training-data pipeline.

Keeps, per group, the ``cap`` rows with the smallest portable 60-bit
hash of ``(seed, key)`` — a uniform random ``cap``-subset in
distribution, yet fully deterministic, re-runnable, and reproducible in
ANSI SQL (the engine's standard trick: the sample an auditor recomputes
is the sample the pipeline shipped). Changing ``seed`` redraws the
sample; changing ``cap`` only grows/shrinks it monotonically (the
kept set at cap k is a prefix of the kept set at cap k+1 — useful for
quota tuning without churning the corpus).

Scale shape: the same two-level sharded rank as the KMV sketch
(``sketch.bottom_k_hashes``) but carrying whole rows — level 1 ranks
within (group, ``h % shards``) so a hot group (a crawl dump where one
domain is 30% of all pages) never sorts in a single task; level 2 ranks
the ≤ shards·cap survivors. The global bottom-cap is a subset of every
shard's bottom-cap, so the result equals the single-window form
(property-tested), at two bounded shuffles.

``key_col`` must identify rows uniquely (e.g. a doc id): the rank
orders by ``(h, key)``, so uniqueness makes the kept set well-defined —
the contract that gives the exact SQL oracle. For WEIGHTED sampling see
``weighted_sample_per_group`` below: Efraimidis–Spirakis ``u^(1/w)``
keys are deliberately avoided (``pow``/``ln`` are libm calls whose
last-ulp behavior differs across engines, breaking exactness); the
integer replica race gives the same without-replacement distribution
with hash-only arithmetic.

Reference analog: ``Coin`` (``step/Coin.scala``) is the reference's only
sampler — Bernoulli and nondeterministic (``Math.random()``); the
catalog's ``coin_hash_sample`` fixes the determinism, this operator adds
the exact-quota semantics Coin cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from ..functions.text import hash60


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    weight_col: str,
    n: int,
    seed: str = "wcap",
    shards: int = 16,
) -> DataFrame:
    """EXACT weighted sampling without replacement, ``n`` rows per
    group, for positive INTEGER weights — deterministic and
    SQL-reproducible.

    Scheme: replicate each row's key ``w`` times, draw one uniform hash
    per replica, and rank rows by their MINIMUM draw. All Σw replica
    draws are i.i.d., so their ranking is a uniform permutation of the
    replicas, and the order in which distinct rows first appear follows
    the sequential weighted-without-replacement distribution exactly —
    P(first = i) = wᵢ/Σw, P(second = j | first = i) = wⱼ/(Σw − wᵢ), and
    so on (the classic replica-race equivalence). This is the
    integer-weight alternative to Efraimidis–Espirakis ``u^(1/w)`` keys,
    whose ``pow`` would break the cross-engine exactness contract
    (module doc).

    Cost and contract: rows explode ×w — weights must be SMALL integers
    (scale/quantize first, e.g. ``1 + bytes div 1000``); the min-draw
    per row is a map-side-combinable ``min`` and the final per-group
    top-n reuses the two-level sharded rank. Rows with ``w <= 0`` are
    excluded (never sampled), matching the probability they deserve.
    """
    w = F.col(weight_col).cast("long")
    draws = (
        df.where(w > 0)
        .withColumn("__r", F.explode(F.sequence(F.lit(1), w)))
        .withColumn(
            "__d",
            hash60(
                F.concat_ws(
                    ":", F.lit(seed), F.col(key_col).cast("string"),
                    F.col("__r").cast("string"),
                )
            ),
        )
        .groupBy(*group_cols, key_col)
        .agg(F.min("__d").alias("__h"))
    )
    w1 = Window.partitionBy(*group_cols, "__s").orderBy("__h", key_col)
    w2 = Window.partitionBy(*group_cols).orderBy("__h", key_col)
    picked = (
        draws.withColumn("__s", F.pmod(F.col("__h"), F.lit(shards)))
        .withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= n)
        .withColumn("__r2", F.row_number().over(w2))
        .where(F.col("__r2") <= n)
        .select(*group_cols, key_col)
    )
    return df.join(picked, [*group_cols, key_col], "semi")


def group_capped_sample(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    cap: int,
    seed: str = "cap",
    shards: int = 16,
) -> DataFrame:
    """Keep ≤ ``cap`` rows per group, chosen uniformly-by-hash; output
    schema = input schema (sample columns are internal)."""
    h = hash60(
        F.concat_ws(":", F.lit(seed), F.col(key_col).cast("string"))
    )
    w1 = Window.partitionBy(*group_cols, "__s").orderBy("__h", key_col)
    w2 = Window.partitionBy(*group_cols).orderBy("__h", key_col)
    return (
        df.withColumn("__h", h)
        .withColumn("__s", F.pmod(F.col("__h"), F.lit(shards)))
        .withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= cap)
        .withColumn("__r2", F.row_number().over(w2))
        .where(F.col("__r2") <= cap)
        .drop("__h", "__s", "__r1", "__r2")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    salt: str = "split",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment — the dataset-split stage
    of a curation pipeline. Each row lands in exactly one split by the
    portable 60-bit hash of ``salt || id`` mod 100 (< train_pct → train,
    < train_pct+val_pct → val, else test), so the split is stable across
    runs/engines/partitionings, reproducible from the id alone, and
    leak-free (an id can never move between splits when the corpus grows
    — the property random splits lack). Adds a ``split`` string column;
    no shuffle (a pure projection the scan pipelines)."""
    bucket = F.pmod(
        hash60(F.concat(F.lit(salt + ":"),
                        F.col(id_col).cast("string"))),
        F.lit(100),
    )
    return df.withColumn(
        "split",
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def negative_samples(
    spark: SparkSession,
    pairs: DataFrame,
    weights: DataFrame,
    k: int = 2,
    tag: str = "neg",
    blocks: int = 1024,
) -> DataFrame:
    """Deterministic weighted negative sampling — the word2vec/LINE
    training companion: for every positive ``(center, context)`` pair,
    draw ``k`` negatives from the ``weights`` table's categorical
    distribution (``(id, w)``, positive integer weights, typically
    vertex degree).

    The draw is a distributed inverted-CDF lookup with NO range join and
    no driver-side alias table: vertex ``v`` owns the half-open interval
    ``[lo_v, lo_v + w_v)`` of the cumulative weight line (exclusive
    prefix sum via the sharded-window decomposition,
    packing.exclusive_prefix_sum — no global single-task window); the
    line is cut into ``blocks`` fixed-width blocks; each vertex explodes
    into the blocks its interval overlaps (Σ ≈ blocks + |V| rows — a hub
    owning 25% of the mass owns 25% of the block rows but they are
    SPREAD over 25% of the block KEYS, so the subsequent join has no hot
    key); a draw ``d = hash60(tag:center:context:j) mod W`` equi-joins
    on ``d div B`` and keeps the one row with ``lo <= d < hi``.

    Returns ``(center, context, k, neg)``.  Accidental hits
    (``neg == center`` or ``context``) are kept, as in word2vec's
    unigram-table sampler — resampling would make the draw sequence
    data-dependent and break exact replay.
    """
    from .packing import exclusive_prefix_sum

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # eager checkpoint: ``cum`` is consumed three times (total, block
    # expansion, lookup join) — without it the caller's weights lineage
    # (often a full-edge degree count) re-executes per consumer
    # (measured 28.5 s → ~9 s on the 1M-vertex probe).  |V|-row and
    # never broadcast-joined, so the stats-less-LogicalRDD caveat
    # (operators/msf.py) doesn't bite.
    cum = exclusive_prefix_sum(
        weights.select(F.col("id").cast("long"), F.col("w").cast("long")),
        "id", "w", out_col="lo",
    ).localCheckpoint(eager=True).transform(strip_plan_stats)
    total = cum.agg(F.sum("w")).collect()[0][0]
    if not total:
        return spark.createDataFrame(
            [], "center long, context long, k int, neg long"
        )
    bsize = max(1, -(-int(total) // blocks))  # ceil
    owner = cum.select(
        "id", "lo", (F.col("lo") + F.col("w")).alias("hi"),
        F.explode(
            F.sequence(
                F.expr(f"lo div {bsize}"), F.expr(f"(lo + w - 1) div {bsize}")
            )
        ).alias("blk"),
    )
    draws = pairs.select(
        F.col("center").cast("long"), F.col("context").cast("long")
    ).select(
        "center", "context",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("k"),
    ).withColumn(
        "d",
        F.pmod(
            hash60(
                F.concat_ws(
                    ":", F.lit(tag), F.col("center").cast("string"),
                    F.col("context").cast("string"), F.col("k").cast("string"),
                )
            ),
            F.lit(int(total)),
        ),
    ).withColumn("blk", F.expr(f"d div {bsize}"))
    return (
        draws.join(owner, "blk")
        .where((F.col("d") >= F.col("lo")) & (F.col("d") < F.col("hi")))
        .select("center", "context", "k", F.col("id").alias("neg"))
    )
