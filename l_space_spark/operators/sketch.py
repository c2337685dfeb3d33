"""KMV (K-minimum-values) distinct-count sketch — deterministic, mergeable.

The classic bottom-k sketch (Bar-Yossef et al. 2002; the basis of theta
sketches): keep the K smallest values of a uniform hash of the items; with
``kth`` = the K-th smallest over domain ``[0, 2^60)``, the distinct count
estimates as ``(K−1) · 2^60 / kth`` (< K distinct hashes ⇒ the sketch IS
the exact distinct set). Three properties make it the engine's kind of
sketch:

- **deterministic**: built on the portable 60-bit md5 hash
  (functions/text.hash60), so the same data yields the same sketch — and
  the same ESTIMATE — in any engine; the catalog carries an exact DuckDB
  oracle for an approximate operator (the LSH/IVF pattern).
- **mergeable**: union of sketches = bottom-K of the concatenation —
  re-aggregable across partitions/chunks/days like count+sum.
- **scale-shaped**: the bottom-K per group comes from a TWO-LEVEL rank
  window over deduped hashes (shard-partial bottom-k, then bottom-k of
  the ≤ shards·k survivors) — a hot group's distinct set is never sorted
  in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hash60

DOMAIN = float(1 << 60)


def bottom_k_hashes(hashed: DataFrame, k: int, shards: int) -> DataFrame:
    """Bottom-``k`` per group of DISTINCT ``(g, h)`` hash rows →
    ``(g, sketch sorted array<long>, n_kept)``.

    Two-level bottom-k: level 1 ranks within (group, ``h % shards``) — a
    hot group's distinct hashes spread over ``shards`` tasks, each keeping
    ≤ k — then level 2 ranks the ≤ shards·k survivors per group. The
    global bottom-k is a subset of every shard-level bottom-k, so the
    result is identical to the single-window form while no task ever sees
    more than (group's distinct)/shards + shards·k rows."""
    w1 = Window.partitionBy("g", "__s").orderBy("h")
    survivors = (
        hashed.withColumn("__s", F.pmod(F.col("h"), F.lit(shards)))
        .withColumn("__r", F.row_number().over(w1))
        .where(F.col("__r") <= k)
    )
    w2 = Window.partitionBy("g").orderBy("h")
    return (
        survivors.withColumn("__r2", F.row_number().over(w2))
        .where(F.col("__r2") <= k)
        .groupBy("g")
        .agg(
            F.sort_array(F.collect_list("h")).alias("sketch"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )


def kmv_sketch(df: DataFrame, group_col: str, item_col: str,
               k: int = 64, shards: int = 64) -> DataFrame:
    """Per group: the bottom-``k`` distinct item hashes as a sorted array
    (``sketch``), plus ``n_kept``. Mergeable: union two sketches by
    re-taking the bottom-k of the concatenation (``kmv_merge``)."""
    hashed = df.groupBy(
        F.col(group_col).alias("g"), hash60(F.col(item_col)).alias("h")
    ).agg(F.lit(1).alias("__one"))
    return bottom_k_hashes(hashed, k, shards)


def kmv_merge(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Merge per-group sketch rows (e.g. per-day partials) into one sketch
    per group: bottom-k of the concatenated hash arrays."""
    return (
        sketches.select("g", F.explode("sketch").alias("h"))
        .groupBy("g", "h").agg(F.lit(1).alias("__one"))
        .withColumn(
            "__r", F.row_number().over(Window.partitionBy("g").orderBy("h"))
        )
        .where(F.col("__r") <= k)
        .groupBy("g")
        .agg(
            F.sort_array(F.collect_list("h")).alias("sketch"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )


def kmv_estimate(sketches: DataFrame, k: int = 64) -> DataFrame:
    """(g, est) distinct-count estimate per group: exact ``n_kept`` when
    the sketch is unsaturated, else ``(k−1)·2^60 / kth`` — integer inputs
    and one IEEE division, so the estimate is bit-reproducible in SQL."""
    kth = F.element_at(F.col("sketch"), k).cast("double")
    return sketches.select(
        "g",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(DOMAIN) / kth)
        .alias("est"),
    )
