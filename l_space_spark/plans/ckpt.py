"""Stats-truncating local checkpoint — the fix for Catalyst's BigInt
size-estimate blowup in self-join doubling loops.

``Dataset.localCheckpoint`` truncates LINEAGE (the plan becomes a
LogicalRDD scan) but PRESERVES the original plan's statistics: the
returned LogicalRDD carries ``originStats``, so ``sizeInBytes`` — a
product of join-children estimates accumulated through however many
joins produced the input — survives the checkpoint. That estimate is a
``BigInt``, and Catalyst multiplies it again at every downstream join.

In a pointer-doubling loop (``eulertour.euler_tour``, sparse-table
level builds) each round SELF-joins the previous round's checkpoint, so
the estimate SQUARES per round: its digit count doubles, and BigInt
multiplication inside ``SizeInBytesOnlyStatsPlanVisitor`` — run on the
driver during every job's planning — doubles in cost with it. Measured
on the sf0.01 bridges pipeline (canon → Borůvka → star-contraction
inputs, whose estimate already had ~10^5 DIGITS): rounds went
0.2 s → 0.4 → 0.8 → 1.5 → 4.4 → 11.7 → 39.4 s while rows (1910), plan
(one LogicalRDD scan), stages (5) and tasks (5) stayed CONSTANT — pure
driver-side BigInt arithmetic. With the stats chain cut: 0.07 s flat.

``reset_stats_checkpoint`` = localCheckpoint + rebuild the DataFrame
directly over the checkpointed row RDD via the JVM session's
``internalCreateDataFrame``, which creates a LogicalRDD WITHOUT
originStats — its size estimate falls back to the session default
(a plain long), and the product chain restarts from there. The blocks
are the same checkpointed blocks (the rebuilt plan scans them; no extra
materialization, no extra storage). Join-strategy impact: none in the
loops that use this — the default estimate is far above every broadcast
threshold, exactly like the inflated estimate it replaces.

``internalCreateDataFrame`` is ``private[sql]`` in Scala, which erases
to a public method in bytecode — callable through py4j on every Spark
the sandbox ships. If a future Spark removes it, the fallback is the
plain localCheckpoint: correctness identical, speed degraded on
doubling loops.
"""

from __future__ import annotations

import warnings

from py4j.protocol import Py4JError, Py4JJavaError
from pyspark.sql import DataFrame

_FALLBACK_WARNED = False


def strip_plan_stats(df: DataFrame) -> DataFrame:
    """Drop the inherited Catalyst size-estimate chain from an ALREADY
    materialized (checkpointed/cached) frame by rebuilding it over its
    row RDD — same blocks, same rows, fresh default stats. Chain it
    after an in-loop checkpoint:
    ``df.localCheckpoint(eager=True).transform(strip_plan_stats)``."""
    global _FALLBACK_WARNED
    spark = df.sparkSession
    try:
        jdf = df._jdf
        jdf2 = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(jdf2, spark)
    except (AttributeError, TypeError, Py4JError) as e:
        if isinstance(e, Py4JJavaError):
            raise  # a real JVM fault (OOM, codegen, analysis) — not drift
        # private-API drift (internalCreateDataFrame removed/renamed/
        # re-signatured → py4j method-resolution errors, NOT
        # Py4JJavaError): keep correctness, lose speed — but say so
        # ONCE, because the quadratic-stats path this degrades to cost
        # 0.2 s → 39 s/round before round 4's fix. Anything else
        # propagates.
        if not _FALLBACK_WARNED:
            _FALLBACK_WARNED = True
            warnings.warn(
                "strip_plan_stats: internalCreateDataFrame unavailable — "
                "falling back to un-stripped plans (inherited Catalyst "
                "size estimates will compound through self-join loops)",
                RuntimeWarning,
                stacklevel=2,
            )
        return df


def reset_stats_checkpoint(df: DataFrame) -> DataFrame:
    """Eager ``localCheckpoint`` that also cuts the inherited Catalyst
    size-estimate chain (module doc). Use for ANY state that a loop
    re-joins against itself; harmless elsewhere."""
    return strip_plan_stats(df.localCheckpoint(eager=True))
