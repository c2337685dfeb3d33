"""Operator-level tests for the temporal join shapes (operators/temporal)
and SSSP edge cases — golden mini-data, independent of the catalog tables.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_join_golden(spark):
    from l_space_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10, _ts(100)), (2, 10, _ts(200)), (3, 10, _ts(50)),
         (4, 20, _ts(100))],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(100), 1.0), (10, _ts(150), 2.0), (30, _ts(10), 9.0)],
        "k long, ts timestamp, v double",
    )
    out = {
        r["lid"]: (r["v_r"], r["ts_r"])
        for r in asof_join(left, right, key_col="k", ts_col="ts",
                           right_cols=["v"]).collect()
    }
    assert out[1] == (1.0, _ts(100))   # equal ts counts (non-strict)
    assert out[2] == (2.0, _ts(150))   # latest prior
    assert out[3] == (None, None)      # nothing at/before 50
    assert out[4] == (None, None)      # key has no right rows at all


def test_asof_join_empty_right(spark):
    from l_space_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 10, _ts(1))], "lid long, k long, ts timestamp")
    right = spark.createDataFrame([], "k long, ts timestamp, v double")
    rows = asof_join(left, right, "k", "ts", ["v"]).collect()
    assert len(rows) == 1 and rows[0]["v_r"] is None


def test_banded_range_join_golden_and_boundaries(spark):
    from l_space_spark.operators.temporal import banded_range_join_count

    left = spark.createDataFrame(
        [(1, 10, _ts(3600)), (2, 10, _ts(10_000)), (3, 20, _ts(3600))],
        "lid long, k long, ts timestamp",
    )
    # clicks at 0 (exactly lo), 1, 3600 (exactly hi), 3601 (outside)
    right = spark.createDataFrame(
        [(10, _ts(0)), (10, _ts(1)), (10, _ts(3600)), (10, _ts(3601))],
        "k long, ts timestamp",
    )
    out = {
        r["lid"]: r["n"]
        for r in banded_range_join_count(
            left, right, key_col="k", ts_col="ts", lo_s=-3600, hi_s=0,
            left_id="lid", count_alias="n",
        ).collect()
    }
    assert out[1] == 3   # 0, 1, 3600 inclusive; 3601 excluded
    assert out[2] == 0   # window [6400, 10000] is empty
    assert out[3] == 0   # other key


def test_sssp_source_not_in_graph(spark):
    """A source absent from the edge set reaches nothing: every vertex
    stays dist NULL (documented unreachable semantics)."""
    from l_space_spark.operators.sssp import sssp

    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    res = sssp(spark, e, source=99, resume=False)
    assert all(r["dist"] is None for r in res.state.collect())
    # and a real source for contrast
    res2 = sssp(spark, e, source=1, resume=False)
    d = {r["id"]: r["dist"] for r in res2.state.collect()}
    assert d == {1: 0, 2: 1, 3: 2}
