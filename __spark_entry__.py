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


def main(argv: list[str]) -> None:
    """CLI: execute a serialized job spec (SURVEY §3.2 — the analog of the
    reference's wire traversals, ``LibrarianApi.scala:102-121``)::

        spark-submit --py-files pkg.zip __spark_entry__.py --job spec.json

    ``--show N`` prints the first N result rows (default 20) when the spec
    has no ``output`` sink; ``--json`` prints them as JSON lines instead.
    """
    import argparse

    from l_space_spark.jobspec import run_job

    ap = argparse.ArgumentParser(prog="__spark_entry__")
    ap.add_argument("--job", required=True,
                    help="path to a JSON job spec (or an inline JSON string)")
    ap.add_argument("--show", type=int, default=20)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    import json as _json

    spark = SparkSession.builder.appName("l_space_spark.job").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    result = run_job(spark, args.job)
    spec = args.job if args.job.lstrip().startswith("{") else open(args.job).read()
    has_sink = bool(_json.loads(spec).get("output"))
    if has_sink:
        # the sink write inside run_job already executed the plan; showing
        # rows here would re-execute the whole (unpersisted) job
        print("result written to output sink")
    elif args.json:
        for row in result.limit(args.show).toJSON().collect():
            print(row)
    else:
        result.show(args.show, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
