"""Local mirror of the driver's correctness gate: run every ``queries()``
entry on Spark and its ``oracle_sql()`` twin on DuckDB at sf0.001, compare
row count, column names, and exact sorted values.

This is stricter than the driver's order-insensitive value hash (exact
python equality incl. floats) — if this passes, the hash gate passes.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from l_space_spark.sources import TABLES  # noqa: E402

# default mirrors the smoke scale; set LSPACE_TEST_SF_DIR=/root/testdata/sf0.01
# to rehearse at the driver's correctness scale
SF_DIR = os.environ.get("LSPACE_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _rows(df_rows, cols):
    return sorted((tuple(_norm(r[c]) for c in cols) for r in df_rows), key=repr)


ALL = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, ddb, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    scols = sdf.columns
    srows = _rows(sdf.collect(), scols)
    if name not in oracles:
        pytest.skip(f"{name}: rows-only check (no SQL oracle)")
    res = ddb.sql(oracles[name])
    ocols = res.columns
    assert scols == list(ocols), f"{name}: column mismatch {scols} vs {ocols}"
    orows = sorted((tuple(_norm(v) for v in row) for row in res.fetchall()),
                   key=repr)
    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} vs {len(orows)}"
    )
    mism = [(a, b) for a, b in zip(srows, orows) if a != b][:5]
    assert not mism, f"{name}: value mismatches {mism}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert df.columns == ["id", "rank_e6"]
