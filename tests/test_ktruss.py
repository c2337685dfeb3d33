"""k-truss peeling vs a python fixpoint twin."""

import random
from itertools import combinations

from l_space_spark.operators.ktruss import ktruss

from conftest import edges_df


def truss(pairs, k):
    edges = {tuple(sorted((s, d))) for s, d in pairs if s != d}
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in edges}
        keep = {e for e in edges if sup[e] >= k - 2}
        if keep == edges:
            return edges
        edges = keep


def _run(spark, pairs, k, **kw):
    res = ktruss(spark, edges_df(spark, pairs), k=k, num_partitions=4, **kw)
    return {(r["a"], r["b"]) for r in res.state.collect()}, res


def test_k4_keeps_clique_drops_tail(spark):
    k5 = [e for e in combinations(range(5), 2)]
    pairs = k5 + [(4, 10), (10, 11)]
    got, res = _run(spark, pairs, k=4)
    assert got == set(k5)
    assert res.converged


def test_triangle_survives_k3_dies_k4(spark):
    tri = [(0, 1), (1, 2), (2, 0)]
    got3, _ = _run(spark, tri, k=3)
    assert got3 == {(0, 1), (0, 2), (1, 2)}
    got4, _ = _run(spark, tri, k=4)
    assert got4 == set()


def test_cascade_peel_matches_twin(spark):
    # removing one edge's support cascades: twin fixpoint equality
    for seed in (3, 9):
        rng = random.Random(seed)
        pairs = [(rng.randrange(14), rng.randrange(14)) for _ in range(45)]
        got, res = _run(spark, pairs, k=4)
        assert got == truss(pairs, 4), f"seed={seed}"
        assert res.converged
