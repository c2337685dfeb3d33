"""Incremental hypertable-rollup semantics (operators/rollup.py): only
changed chunks recompute; the rollup always equals a one-shot GROUP BY.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from l_space_spark.operators.rollup import (
    read_rollup, refresh_rollup, write_hypertable,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(dt.datetime(2024, 1, d, h), t, float(v)) for d, h, t, v in rows],
        "ts timestamp, event_type string, value double",
    )


def _full(df):
    return {
        (r["bucket"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in df.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value")
        ).collect()
    }


def _rolled(spark, ru):
    return {
        (r["bucket"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in read_rollup(spark, ru).collect()
    }


def test_rollup_incremental_refresh(spark, tmp_path):
    ht, ru = str(tmp_path / "ht"), str(tmp_path / "ru")
    base = _events(spark, [
        (1, 0, "a", 1.5), (1, 0, "a", 2.5), (1, 3, "b", 1.0),
        (2, 5, "a", 4.0), (3, 7, "b", 0.5),
    ])
    write_hypertable(base, ht)

    # initial refresh: every chunk computes; rollup == one-shot GROUP BY
    changed = refresh_rollup(spark, ht, ru)
    assert changed == ["2024-01-01", "2024-01-02", "2024-01-03"]
    assert _rolled(spark, ru) == _full(base)

    # steady state: nothing changed → nothing recomputes
    assert refresh_rollup(spark, ht, ru) == []

    # late data lands in day 2's chunk only → exactly one chunk refreshes
    late = _events(spark, [(2, 5, "a", 6.0), (2, 9, "c", 1.0)])
    late.write.mode("append").parquet(os.path.join(ht, "__chunk=2024-01-02"))
    changed = refresh_rollup(spark, ht, ru)
    assert changed == ["2024-01-02"]
    want = _full(base.unionByName(late))
    assert _rolled(spark, ru) == want

    # a NEW day appends one chunk; old chunks untouched
    newday = _events(spark, [(4, 1, "a", 2.0)])
    newday.write.mode("append").parquet(os.path.join(ht, "__chunk=2024-01-04"))
    assert refresh_rollup(spark, ht, ru) == ["2024-01-04"]
    assert _rolled(spark, ru) == _full(
        base.unionByName(late).unionByName(newday)
    )
