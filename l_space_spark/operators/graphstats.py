"""Whole-graph structure operators: bipartite projection and degree
assortativity.

``bipartite_project`` folds a bipartite edge table (e.g. the
customer→supplier graph the TPC-H extraction yields) into a weighted
one-mode co-neighbor graph: suppliers become linked when they share a
customer, with the shared-customer count as the edge weight — the
standard co-purchase / co-occurrence construction. Shape: a hub wedge
equi-join on the left-mode vertex (pairs are GENERATED, never
enumerated), with the same ``max_hub_degree`` celebrity trim as
``linkpred.neighbor_jaccard`` (a customer connected to every supplier
asserts nothing and inflates the fold quadratically).

``degree_assortativity`` is Newman's degree-correlation coefficient r
(Pearson correlation of endpoint degrees over the undirected edge set,
each edge counted in both orientations). All five sufficient statistics
(n, Σx, Σy, Σxy, Σx², Σy²) are exact integer sums; the final formula is
a handful of IEEE multiplies, one ``sqrt`` and one divide — and IEEE-754
``sqrt`` is CORRECTLY ROUNDED (unlike ``ln``/``pow``), so the e6
fixed-point result is bit-reproducible in SQL, keeping the exact-oracle
contract that bans libm-dependent expressions elsewhere.

Reference analog: none — the reference can express the two-hop traversal
behind a projection (``out().in()``) but not the weighted fold or any
whole-graph statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import undirect


def bipartite_project(
    edges: DataFrame,
    max_hub_degree: int | None = None,
) -> DataFrame:
    """Fold src→dst bipartite edges into ``(u, w, weight)`` rows over
    the dst mode (``u < w``, weight = number of shared src hubs)."""
    e = edges.select("src", "dst").distinct()
    if max_hub_degree is not None:
        ok = (
            e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") <= max_hub_degree).select("src")
        )
        e = e.join(ok, "src", "semi")
    a = e.select(F.col("src").alias("h"), F.col("dst").alias("u"))
    b = e.select(F.col("src").alias("h"), F.col("dst").alias("w"))
    return (
        a.join(b, "h")
        .where(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )


def rectangle_count(
    edges: DataFrame,
    max_hub_degree: int | None = None,
) -> DataFrame:
    """One row ``(rectangles BIGINT)``: the number of 4-cycles (C4
    subgraphs) of the undirected simple graph — the quadrilateral
    companion to ``triangle_count`` and the standard second moment of
    local clustering (chords do not disqualify a quadrilateral).

    Identity: every 4-cycle ``u-v-w-x`` is determined by a diagonal
    pair ``{u, w}`` plus an unordered choice of two of their common
    neighbors, and each cycle owns exactly TWO diagonals, so
    ``C4 = ½ · Σ_{u<w} C(codeg(u,w), 2)`` — all integer arithmetic
    (``c(c-1)`` is always even, and the diagonal double-count makes the
    outer sum even), hence an exact cross-engine oracle with no fixed
    point.

    Plan shape: the same hub wedge equi-join as ``linkpred`` (two
    closure copies sharing their ``src``), one combiner-backed groupBy
    for the co-degree table, one scalar aggregate — never an explicit
    4-tuple enumeration. Skew: wedge fan-out is Σ deg², bounded by
    ``max_hub_degree`` as a VERTEX-INDUCED-SUBGRAPH cap: every edge
    touching an over-cap vertex is dropped, so a capped run returns the
    EXACT rectangle count of the subgraph induced on vertices with
    degree ≤ cap (a one-sided edge cap would let a rectangle qualify
    through only one of its two diagonals, making the incidence sum odd
    and the final integer halving lossy). The exact-oracle catalog
    entry runs uncapped on the small fixture.
    """
    und = undirect(edges)
    hub = und
    if max_hub_degree is not None:
        deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        ok = deg.where(F.col("d") <= max_hub_degree).select("src")
        hub = und.join(ok, "src", "semi").join(
            ok.withColumnRenamed("src", "dst"), "dst", "semi"
        )
    w1 = hub.select(F.col("src").alias("v"), F.col("dst").alias("u"))
    w2 = hub.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    codeg = (
        w1.join(w2, "v")
        .where(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # integer div throughout (never a double): c(c-1) is even per term
    # and the diagonal double-count makes the total even, so both
    # divisions are exact — and the sum stays in BIGINT at any scale
    return codeg.agg(
        F.expr("coalesce(sum(c * (c - 1) div 2), 0) div 2")
        .cast("long").alias("rectangles")
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """One row ``(r_e6 long)``: Newman's degree assortativity of the
    undirected simple graph at e6 fixed point (NULL when degenerate —
    all degrees equal makes the variance zero)."""
    und = undirect(edges)
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    dx = deg.select(F.col("src").alias("a"), F.col("d").alias("x"))
    dy = deg.select(F.col("src").alias("b"), F.col("d").alias("y"))
    pairs = (
        und.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(dx, "a").join(dy, "b")
    )
    # every sufficient statistic is an exact integer sum, converted to
    # double ONCE (same promotion points as the SQL oracle) before the
    # closed-form correlation
    s = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    r = num / F.sqrt(varx * vary)
    return s.select(
        F.when(
            (varx > 0) & (vary > 0),
            F.floor(r * F.lit(1e6) + F.lit(0.5)).cast("long"),
        ).alias("r_e6")
    )
