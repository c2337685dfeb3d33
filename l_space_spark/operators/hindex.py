"""Distributed h-index kernel shared by the cohesion decompositions
(``coreness.py`` vertex dynamics, ``trussness.py`` edge dynamics).

The naive formulation — ``row_number`` over a per-group descending
window then ``max(least(value, rank))`` — sorts every group's FULL
inbox, so a power-law hub's million-message inbox lands in one window
task every round.  This kernel is the histogram/count formulation:

1. ``groupBy(keys, value)`` — a hash aggregate with map-side partial
   combine, so a hub's inbox collapses to its distinct values BEFORE
   the shuffle.  For degree-derived dynamics the number of distinct
   values per group is O(sqrt(E)) (a graph has at most O(sqrt(E))
   distinct degrees, and later-round estimates only shrink), NOT
   O(degree).
2. A running suffix-count over the per-group distinct values and the
   closed form ``h = max over distinct values m of min(m, #{v >= m})``
   (the count function is constant between consecutive distinct values,
   so checking thresholds at the distinct values is exhaustive).

The per-group window now sorts <= #distinct-values rows instead of the
inbox, and the heavy reduction happens in combiner-backed hash
aggregates — the hub-safe shape at 100x scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def h_index_by(msgs: DataFrame, keys: list[str], value_col: str,
               out: str = "h") -> DataFrame:
    """Per-``keys`` h-index of ``value_col``: the largest ``h`` such that
    the group has at least ``h`` values ``>= h``.  Values must be
    non-negative integers (long).  Groups absent from ``msgs`` are
    simply absent from the result (callers left-join + coalesce 0)."""
    cnt = msgs.groupBy(*keys, value_col).agg(F.count(F.lit(1)).alias("__n"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.desc(value_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cnt.withColumn("__ge", F.sum("__n").over(w))
        .groupBy(*keys)
        .agg(F.max(F.least(F.col(value_col), F.col("__ge"))).alias(out))
    )
