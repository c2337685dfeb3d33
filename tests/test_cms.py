"""Count-Min sketch (operators/sketch.py cms_*): exactness against a
Python twin, the never-underestimate guarantee, and the sum merge law."""

import hashlib
from collections import Counter

import pytest

from l_space_spark.operators.sketch import cms_build, cms_merge, cms_query

DEPTH = 3
WIDTH = 16  # tiny → collisions guaranteed, overestimation exercised


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_cells(items):
    cells = Counter()
    for v in items:
        for i in range(DEPTH):
            cells[(i, _h60(f"{v}:{i}") % WIDTH)] += 1
    return cells


def _py_est(cells, v):
    return min(cells.get((i, _h60(f"{v}:{i}") % WIDTH), 0)
               for i in range(DEPTH))


# a skewed stream: item k appears k times
STREAM = [k for k in range(1, 13) for _ in range(k)]


@pytest.fixture(scope="module")
def cms(spark):
    df = spark.createDataFrame([(v,) for v in STREAM], "v long")
    return cms_build(df, "v", depth=DEPTH, width=WIDTH).persist()


def test_cells_match_python_twin(spark, cms):
    got = {(r["row"], r["col"]): r["cnt"] for r in cms.collect()}
    assert got == dict(_py_cells(STREAM))


def test_estimates_never_underestimate(spark, cms):
    probes = spark.createDataFrame(
        [(v,) for v in range(0, 20)], "v long"  # 0 and 13..19 unseen
    )
    got = {r["id"]: r["est"]
           for r in cms_query(cms, probes, "v",
                              depth=DEPTH, width=WIDTH).collect()}
    cells = _py_cells(STREAM)
    true = Counter(STREAM)
    for v in range(0, 20):
        assert got[v] == _py_est(cells, v), v
        assert got[v] >= true[v], v  # CMS never underestimates


def test_merge_law(spark, cms):
    a = spark.createDataFrame([(v,) for v in STREAM[:30]], "v long")
    b = spark.createDataFrame([(v,) for v in STREAM[30:]], "v long")
    merged = cms_merge(
        cms_build(a, "v", depth=DEPTH, width=WIDTH).unionByName(
            cms_build(b, "v", depth=DEPTH, width=WIDTH)
        )
    )
    assert (
        {(r["row"], r["col"]): r["cnt"] for r in merged.collect()}
        == {(r["row"], r["col"]): r["cnt"] for r in cms.collect()}
    )
