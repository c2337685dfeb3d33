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


def test_banded_range_join_fractional_bounds(spark):
    """Regression (ADVICE r2): with fractional lo_s/hi_s, rounding lo_us and
    hi_us independently could make the probed interval 1 µs LONGER than the
    bucket width (here 1000001 µs vs 1000000 µs buckets), so it spans three
    buckets while only the two endpoint buckets are probed — the middle
    bucket's matches were silently dropped. hi_us is now derived as
    lo_us + width_us. Right rows are placed so that, for the left row at
    t=2000.0000008 s, the (old) two probed buckets miss the middle bucket
    containing a true match."""
    from l_space_spark.operators.temporal import banded_range_join_count

    lo_s, hi_s = -1800.0000008, -1799.0000005
    # lo_us = -1800000001, width_us = 1000000; old hi_us rounded to
    # -1799000000 → probe span 1000001 µs. Left at a whole second makes
    # (lt + lo_us) mod width == 999999, so the old probed interval spans
    # THREE 1 s buckets; the two in-window right rows (200.2 s, 200.9 s)
    # sit in the unprobed middle bucket and were counted 0 by the old code.
    left = spark.createDataFrame(
        [(1, 10, _ts(2000))], "lid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts(200.2)), (10, _ts(200.9)), (10, _ts(199.9))],
        "k long, ts timestamp",
    )
    out = banded_range_join_count(
        left, right, key_col="k", ts_col="ts", lo_s=lo_s, hi_s=hi_s,
        left_id="lid", count_alias="n",
    ).collect()
    # brute-force oracle at exact µs precision (width derived, not re-rounded)
    epoch = dt.datetime(1970, 1, 1)
    us = lambda t: (t - epoch) // dt.timedelta(microseconds=1)
    lo_us = int(round(lo_s * 1e6))
    hi_us = lo_us + int(round((hi_s - lo_s) * 1e6))
    lt = us(_ts(2000))
    assert (lt + lo_us) % 1_000_000 == 999_999  # the 3-bucket alignment
    expect = sum(
        1 for s in (200.2, 200.9, 199.9)
        if lt + lo_us <= us(_ts(s)) <= lt + hi_us
    )
    assert expect == 2  # sanity: both in-window rows are true matches
    assert out[0]["n"] == expect


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
