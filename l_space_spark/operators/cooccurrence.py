"""Item-item co-occurrence similarity — the market-basket / recsys
companion of the link-prediction family, over REAL bipartite data
(orders × parts) instead of a derived graph.

Score is cosine² in e6 fixed point, pure integer arithmetic:
``score = (cooc² · 10⁶) div (deg_a · deg_b)`` — monotone in the cosine
``cooc / sqrt(deg_a·deg_b)``, so top-k by score equals top-k by cosine
while staying exactly reproducible in the DuckDB oracle (no sqrt, no
floats).

Plan shape for 100 TB: the pair generation is the basket self-join —
quadratic in BASKET size, linear in basket count; TPC-H baskets are
structurally ≤7 items, and ``max_basket`` gives the deterministic
hash-race truncation for corpora with unbounded baskets (a viral
basket of 10⁶ items would otherwise emit 10¹² pairs).  Per-item top-k
uses the two-level sharded rank (shard-local top-k, then global top-k
of the ≤ shards·k survivors) so a hub item with millions of candidate
neighbors never sorts them in one task.

Reference analog: co-citation (`operators/linkpred.py`) with the wedge
center being a real-world container (order) rather than a graph vertex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hash60


def item_cooccurrence_topk(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 3,
    max_basket: int | None = None,
    shards: int = 16,
    tag: str = "cooc",
) -> DataFrame:
    """Top-``k`` co-occurring neighbors per item with integer cosine²
    scores.  Output: (item, neighbor, cooc, score_e6, rnk).

    ``baskets`` rows are (basket, item) memberships; duplicates are
    collapsed.  ``max_basket`` (optional) truncates each basket to its
    hash-race winners before pairing — the skew guard for unbounded
    baskets; leave None when basket size is structurally bounded.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    li = baskets.select(
        F.col(basket_col).cast("long").alias("o"),
        F.col(item_col).cast("long").alias("p"),
    ).distinct()
    if max_basket is not None:
        wb1 = Window.partitionBy("o", "__s").orderBy("__h", "p")
        wb2 = Window.partitionBy("o").orderBy("__h", "p")
        li = (
            li.withColumn(
                "__h",
                hash60(
                    F.concat_ws(
                        ":", F.lit(tag), F.col("o").cast("string"),
                        F.col("p").cast("string"),
                    )
                ),
            )
            .withColumn("__s", F.pmod(F.col("__h"), F.lit(shards)))
            .withColumn("__r1", F.row_number().over(wb1))
            .where(F.col("__r1") <= max_basket)
            .withColumn("__r2", F.row_number().over(wb2))
            .where(F.col("__r2") <= max_basket)
            .select("o", "p")
        )
    # persist WITHOUT an eager unpersist: three consumers (deg + both
    # join sides) share the cache on first materialization; an unpersist
    # at plan-build time would evict before the caller ever collects
    # (the returned frame is lazy), making the persist a no-op.  The
    # cache drops with the plan's lineage (triangles_per_vertex
    # precedent).  localCheckpoint is wrong here: deg must keep its
    # stats so the da/db dimension sides stay broadcast-eligible
    # (operators/msf.py lesson).
    li = li.persist()
    deg = li.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a = li.select(F.col("o"), F.col("p").alias("pa"))
    b = li.select(F.col("o").alias("o2"), F.col("p").alias("pb"))
    pairs = (
        a.join(b, (a["o"] == b["o2"]) & (a["pa"] < b["pb"]))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("cooc"))
    )
    und = pairs.select(
        F.col("pa").alias("x"), F.col("pb").alias("y"), "cooc"
    ).unionByName(
        pairs.select(
            F.col("pb").alias("x"), F.col("pa").alias("y"), "cooc"
        )
    )
    da = deg.select(F.col("p").alias("x"), F.col("d").alias("dx"))
    db = deg.select(F.col("p").alias("y"), F.col("d").alias("dy"))
    sc = (
        und.join(da, "x")
        .join(db, "y")
        .select(
            "x", "y", "cooc",
            # widen intermediates to decimal(38,0): cooc² · 10⁶ wraps a
            # BIGINT once cooc > ~3.04e6, silently inverting the ranking
            # under non-ANSI arithmetic.  The FINAL value always fits
            # (cooc ≤ min(dx,dy) ⇒ score ≤ 10⁶), so only the product
            # needs the width.  Oracle mirrors with HUGEINT.
            F.expr(
                "CAST((CAST(cooc AS DECIMAL(38,0)) * cooc * 1000000)"
                " div (CAST(dx AS DECIMAL(38,0)) * dy) AS BIGINT)"
            ).alias("score_e6"),
        )
        .withColumn("__s", F.pmod(hash60(F.col("y").cast("string")),
                                  F.lit(shards)))
    )
    w1 = Window.partitionBy("x", "__s").orderBy(
        F.col("score_e6").desc(), "y"
    )
    w2 = Window.partitionBy("x").orderBy(F.col("score_e6").desc(), "y")
    out = (
        sc.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .withColumn("rnk", F.row_number().over(w2))
        .where(F.col("rnk") <= k)
        .select(
            F.col("x").alias("item"), F.col("y").alias("neighbor"),
            "cooc", "score_e6", F.col("rnk").cast("long").alias("rnk"),
        )
    )
    return out
