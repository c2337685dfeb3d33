"""Sampled SimRank (operators/simrank.py) — estimator semantics on
hand-checkable fixtures; the exact walk-replay oracle parity lives in
test_entry_oracle/test_catalog via the ``simrank_pairs`` entry."""

import pytest
from pyspark.sql import functions as F

from l_space_spark.operators.simrank import (
    SIMRANK_C,
    score_table_e6,
    simrank_sampled,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _rows(df):
    return {(r.a, r.b): r.sim_e6 for r in df.collect()}


def test_shared_single_in_neighbor_meets_at_step_one(spark):
    # I(a)={z}, I(b)={z}: both reverse walks move to z deterministically
    # at step 1, every replicate → sim = C exactly.
    e = _edges(spark, [(99, 1), (99, 2)])
    got = _rows(simrank_sampled(spark, e, walk_length=3, n_walks=4))
    assert got[(1, 2)] == round(SIMRANK_C * 1_000_000)


def test_disconnected_pairs_absent(spark):
    # two disjoint 2-cycles: cross-component pairs never meet
    e = _edges(spark, [(1, 2), (2, 1), (3, 4), (4, 3)])
    got = _rows(simrank_sampled(spark, e, walk_length=4, n_walks=4))
    assert all(not ((a in (1, 2)) ^ (b in (1, 2))) for a, b in got)


def test_scores_are_c_power_averages(spark, tmp_path):
    # every score must be a floor-average of C^t fixed-point literals
    e = _edges(spark, [(9, 1), (9, 2), (1, 3), (2, 4), (9, 3), (3, 2)])
    T, R = 4, 4
    table = set(score_table_e6(T).values()) | {0}
    got = _rows(simrank_sampled(spark, e, walk_length=T, n_walks=R))
    assert got  # fixture does produce meetings
    for v in got.values():
        # v = floor(sum of R draws from table / R) → bounded by max entry
        assert 0 < v <= max(table)


def test_deterministic_across_runs(spark):
    e = _edges(spark, [(i % 7, (i * 3 + 1) % 7) for i in range(20)])
    a = _rows(simrank_sampled(spark, e, walk_length=3, n_walks=2))
    b = _rows(simrank_sampled(spark, e, walk_length=3, n_walks=2))
    assert a == b and all(x < y for x, y in a)


def test_max_bucket_guard_drops_attractor_meetings(spark):
    # star: I(leaf)={hub} for every leaf — all walks co-locate at the hub
    # at step 1 (bucket size = #leaves). max_bucket=1 drops that bucket.
    e = _edges(spark, [(0, i) for i in range(1, 6)])
    full = _rows(simrank_sampled(spark, e, walk_length=2, n_walks=2))
    assert full  # leaves meet at the hub
    capped = _rows(
        simrank_sampled(spark, e, walk_length=2, n_walks=2, max_bucket=1)
    )
    assert capped == {}
