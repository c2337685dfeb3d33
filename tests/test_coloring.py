"""Jones-Plassmann coloring: properness, mex greediness, python twin."""

import hashlib
import random
from collections import defaultdict

from l_space_spark.operators.coloring import greedy_coloring

from conftest import edges_df


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def jp(pairs, rounds, seed="col"):
    adj = defaultdict(set)
    verts = set()
    for s, d in pairs:
        verts.update((s, d))
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    p = {v: h60(f"{seed}:{v}") for v in verts}
    color = {v: None for v in verts}
    for _ in range(rounds):
        unc = {v for v in verts if color[v] is None}
        ready = [v for v in unc
                 if all(p[u] < p[v] for u in adj[v] if u in unc)]
        for v in ready:
            used = {color[u] for u in adj[v] if color[u] is not None}
            c = 0
            while c in used:
                c += 1
            color[v] = c
    return color


def _run(spark, pairs, rounds=20, **kw):
    res = greedy_coloring(spark, edges_df(spark, pairs),
                          max_rounds=rounds, num_partitions=4, **kw)
    return {r["id"]: r["color"] for r in res.state.collect()}, res


def _proper(pairs, color):
    for s, d in pairs:
        if s != d:
            assert color[s] != color[d], f"edge ({s},{d}) monochrome"


def test_triangle_three_colors(spark):
    pairs = [(0, 1), (1, 2), (2, 0)]
    got, res = _run(spark, pairs)
    assert res.converged
    assert sorted(got.values()) == [0, 1, 2]
    _proper(pairs, got)


def test_bipartite_two_colors_max(spark):
    pairs = [(i, 10 + j) for i in range(4) for j in range(4)]
    got, _ = _run(spark, pairs)
    _proper(pairs, got)
    assert max(got.values()) <= 1  # K4,4 is 2-colorable and JP finds it


def test_random_matches_twin_and_proper(spark):
    for seed, n, m in [(1, 18, 35), (2, 30, 55)]:
        rng = random.Random(seed)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        got, res = _run(spark, pairs)
        assert got == jp(pairs, 20), f"seed={seed}"
        assert res.converged
        _proper(pairs, got)


def test_fixed_rounds_leftover_nulls(spark):
    # a priority-decreasing chain longer than the round budget leaves
    # exactly the twin's NULLs (the oracle-replay contract)
    rng = random.Random(7)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(80)]
    got, _ = _run(spark, pairs, rounds=2, fixed_iters=True)
    assert got == jp(pairs, 2)
