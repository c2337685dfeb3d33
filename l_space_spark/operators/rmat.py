"""Deterministic distributed R-MAT edge synthesis (Chakrabarti, Zhan &
Faloutsos 2004) — the generator tier of the engine: benchmark graphs
with power-law degrees and community structure materialized WHERE THE
WORKERS ARE, never on the driver.

Each edge's coordinates are a pure function of its index: bit ``b`` of
(src, dst) comes from one quadrant draw ``r = hash60(tag:e:b) mod 10⁴``
against the integer-e4 probabilities (a, b, c, d) — counter-based like
synth.py's splitmix64 scheme, so the edge table is identical under any
partitioning or parallelism, and the whole derivation is one
``aggregate`` fold inside the scan stage: ZERO shuffles for any number
of edges.  The same arithmetic replays in ANSI SQL (the catalog
oracle), which a float-RNG generator could never offer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60


def rmat_edges(
    ids: DataFrame,
    scale: int,
    probs_e4: tuple[int, int, int, int] = (5700, 1900, 1900, 500),
    id_col: str = "e",
    tag: str = "rmat",
) -> DataFrame:
    """One (e, src, dst) edge per input row on a ``2**scale``-vertex
    universe.  ``probs_e4`` are the (a, b, c, d) quadrant weights in
    1e-4 fixed point and must sum to 10000 (defaults ≈ the classic
    0.57/0.19/0.19/0.05).
    """
    pa, pb, pc, pd = probs_e4
    if pa + pb + pc + pd != 10000:
        raise ValueError(f"probs_e4 must sum to 10000, got {probs_e4}")
    if not 1 <= scale <= 62:
        raise ValueError(f"scale must be in [1, 62], got {scale}")
    e = F.col(id_col).cast("long")

    def step(acc, b):
        r = F.pmod(
            hash60(
                F.concat_ws(
                    ":", F.lit(tag), e.cast("string"), b.cast("string")
                )
            ),
            F.lit(10000),
        )
        sbit = F.when(r >= pa + pb, F.lit(1)).otherwise(F.lit(0))
        dbit = F.when(
            ((r >= pa) & (r < pa + pb)) | (r >= pa + pb + pc), F.lit(1)
        ).otherwise(F.lit(0))
        return F.struct(
            (acc["src"] * 2 + sbit).alias("src"),
            (acc["dst"] * 2 + dbit).alias("dst"),
        )

    coords = F.aggregate(
        F.sequence(F.lit(1), F.lit(scale)),
        F.struct(
            F.lit(0).cast("long").alias("src"),
            F.lit(0).cast("long").alias("dst"),
        ),
        step,
    )
    return ids.select(
        e.alias("e"), coords.alias("__c")
    ).select("e", F.col("__c.src").alias("src"), F.col("__c.dst").alias("dst"))
