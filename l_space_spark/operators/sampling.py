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
the contract that gives the exact SQL oracle. Weighted sampling
(Efraimidis–Spirakis ``u^(1/w)`` keys) drops into the same rank but is
deliberately NOT shipped: ``pow``/``ln`` are libm calls whose last-ulp
behavior differs across engines, which would break the exactness
contract; use integer weight replication or accept a hash-band
approximation if weights are needed.

Reference analog: ``Coin`` (``step/Coin.scala``) is the reference's only
sampler — Bernoulli and nondeterministic (``Math.random()``); the
catalog's ``coin_hash_sample`` fixes the determinism, this operator adds
the exact-quota semantics Coin cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hash60


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
