"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (PageRank top-10 over the derived
customer–supplier graph at sf0.001). ``queries()`` / ``oracle_sql()`` —
the full catalog from ``l_space_spark.queries`` (graph algorithms with
unrolled-CTE / recursive-CTE oracles, traversal-step families, and the
training-data pipeline operators with portable-hash exact oracles).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from l_space_spark import queries as _q  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top-10 vertices by PageRank (10 fixed supersteps, damping
    0.85, dangling-mass redistribution) on the customer→supplier graph."""
    return _q.QUERIES["pagerank_top20"](spark, SMOKE_SF_DIR).limit(10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
