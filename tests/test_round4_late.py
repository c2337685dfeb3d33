"""Micro-fixture semantics for the round-4 late operators: double-sweep
diameter, cycle rank, bipartite parity certificate, k-center selection,
and the hashed linear quality scorer (vs a pure-python twin)."""

import hashlib

from pyspark.sql import functions as F

from l_space_spark.functions.text import hashed_linear_score
from l_space_spark.operators.centrality import double_sweep
from l_space_spark.operators.components import undirect
from l_space_spark.operators.graphstats import (
    cycle_rank_per_component,
    parity_conflicts,
)
from l_space_spark.operators.similarity import kcenter_gonzalez

from conftest import edges_df


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ------------------------------------------------------------- double sweep


def test_double_sweep_path_graph(spark):
    # path 0-1-2-3-4: seed 0, farthest 4, diameter exactly 4
    und = undirect(edges_df(spark, [(i, i + 1) for i in range(4)]))
    row = double_sweep(spark, und, rounds=8, num_partitions=4).first()
    assert (row["seed"], row["far"], row["diameter_lb"]) == (0, 4, 4)
    assert row["far_reach"] == 4


def test_double_sweep_finds_true_diameter_on_tree(spark):
    # star with one long arm: 0 hub; arm 0-10-11-12; spokes 0-1, 0-2.
    # From seed 0 the farthest is 12 (dist 3); sweep 2 from 12 reaches
    # spoke tips at dist 4 = true diameter.
    pairs = [(0, 1), (0, 2), (0, 10), (10, 11), (11, 12)]
    und = undirect(edges_df(spark, pairs))
    row = double_sweep(spark, und, rounds=8, num_partitions=4).first()
    assert row["diameter_lb"] == 4
    assert row["far"] == 12


# ---------------------------------------------------------------- cycle rank


def test_cycle_rank_tree_cycle_theta(spark):
    # component A: tree (rank 0); B: 4-cycle (rank 1);
    # C: theta graph = 4-cycle + chord (rank 2)
    tree = [(0, 1), (1, 2), (1, 3)]
    cyc = [(10, 11), (11, 12), (12, 13), (13, 10)]
    theta = [(20, 21), (21, 22), (22, 23), (23, 20), (20, 22)]
    df = cycle_rank_per_component(
        spark, edges_df(spark, tree + cyc + theta), num_partitions=4
    )
    got = {r["component"]: (r["n_vertices"], r["n_edges"], r["cycle_rank"])
           for r in df.collect()}
    assert got == {0: (4, 3, 0), 10: (4, 4, 1), 20: (4, 5, 2)}


# ------------------------------------------------------------------- parity


def test_parity_odd_even_cycles(spark):
    # triangle (odd cycle → 1 conflict, not bipartite)
    # + square (even cycle → bipartite)
    tri = [(0, 1), (1, 2), (2, 0)]
    sq = [(10, 11), (11, 12), (12, 13), (13, 10)]
    df = parity_conflicts(
        spark, edges_df(spark, tri + sq), rounds=8, num_partitions=4
    )
    got = {r["component"]: (r["n_edges_checked"], r["n_conflicts"],
                            r["is_bipartite"]) for r in df.collect()}
    assert got == {0: (3, 1, 0), 10: (4, 0, 1)}


def test_parity_odd_cycle_exactly_one_conflict(spark):
    # any odd cycle yields exactly one same-parity edge under BFS coloring
    n = 7
    cyc = [(i, (i + 1) % n) for i in range(n)]
    row = parity_conflicts(
        spark, edges_df(spark, cyc), rounds=8, num_partitions=4
    ).first()
    assert (row["n_conflicts"], row["is_bipartite"]) == (1, 0)


# ------------------------------------------------------------------ k-center


def test_kcenter_picks_farthest_points(spark):
    # 1-D layout embedded in 4 dims: ids 0..3 at x = 0, 1, 10, 21.
    # Start = id 0 (lowest id); pick 1 = 21 (d=441e6 after quant 1000);
    # pick 2 = 10 (min-dist 100e6 vs 21's 121e6... farthest from {0,21});
    # pick 3 = 1.
    pts = [(0, [0.0, 0, 0, 0]), (1, [1.0, 0, 0, 0]),
           (2, [10.0, 0, 0, 0]), (3, [21.0, 0, 0, 0])]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in pts],
        "vec_id long, embedding array<float>",
    )
    got = [(r["rnk"], r["center_id"], r["radius"])
           for r in kcenter_gonzalez(spark, df, k=4).orderBy("rnk").collect()]
    q = 1000
    assert got == [
        (1, 0, 0),
        (2, 3, (21 * q) ** 2),
        (3, 2, (10 * q) ** 2),  # dist to {0}: 100e6 < dist to {3}: 121e6
        (4, 1, (1 * q) ** 2),
    ]


def test_kcenter_radius_nonincreasing_and_ids_distinct(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kcenter_gonzalez(spark, df, k=6).orderBy("rnk").collect()
    radii = [r["radius"] for r in out][1:]
    assert radii == sorted(radii, reverse=True)
    ids = [r["center_id"] for r in out]
    assert len(set(ids)) == 6


# -------------------------------------------------------- hashed linear score


def test_hashed_linear_score_matches_python_twin(spark):
    import re

    docs = [
        (1, "The quick brown fox jumps over the lazy dog 42 times"),
        (2, ""),
        (3, "alpha beta alpha beta gamma"),
        (4, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: (r["n_tokens"], r["score_milli"], r["avg_weight_e3"],
                  r["keep"])
        for r in hashed_linear_score(df, "doc_id", "text").collect()
    }

    def twin(text):
        ts = re.findall(r"[a-z0-9]+", (text or "").lower())
        score = 0
        for t in ts:
            b = _h60("lqw:" + t) % 4096
            score += _h60("lqv:" + str(b)) % 2001 - 1000
        import math

        avg = (
            math.floor(score * 1000 / len(ts) + 0.5) if ts else 0
        )
        return (len(ts), score, avg, 1 if avg > 0 else 0)

    for doc_id, text in docs:
        assert got[doc_id] == twin(text), doc_id


def test_hashed_linear_score_is_map_only(spark):
    df = spark.createDataFrame(
        [(1, "hello world")], "doc_id long, text string"
    )
    plan = hashed_linear_score(df, "doc_id", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
