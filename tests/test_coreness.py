"""Coreness h-index dynamics vs exact peeling core numbers."""

import random
from collections import defaultdict
from itertools import combinations

from l_space_spark.operators.coreness import coreness

from conftest import edges_df


def peel_core_numbers(pairs):
    adj = defaultdict(set)
    verts = set()
    for s, d in pairs:
        verts.update((s, d))
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    deg = {v: len(adj[v]) for v in verts}
    core = {}
    remaining = set(verts)
    k = 0
    while remaining:
        peel = [v for v in remaining if deg[v] <= k]
        if not peel:
            k += 1
            continue
        while peel:
            v = peel.pop()
            if v not in remaining:
                continue  # queued twice before removal
            core[v] = k
            remaining.discard(v)
            for u in adj[v]:
                if u in remaining:
                    deg[u] -= 1
                    if deg[u] <= k:
                        peel.append(u)
    return core


def _run(spark, pairs, **kw):
    res = coreness(spark, edges_df(spark, pairs), num_partitions=4, **kw)
    return {r["id"]: r["c"] for r in res.state.collect()}, res


def test_clique_plus_tail(spark):
    k5 = list(combinations(range(5), 2))
    pairs = k5 + [(4, 10), (10, 11), (7, 7)]
    got, res = _run(spark, pairs)
    assert res.converged
    assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4, 10: 1, 11: 1, 7: 0}


def test_random_graphs_exact_core_numbers(spark):
    for seed, n, m in [(1, 20, 45), (2, 35, 70), (3, 12, 50)]:
        rng = random.Random(seed)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        got, res = _run(spark, pairs)
        assert res.converged, f"seed={seed}"
        assert got == peel_core_numbers(pairs), f"seed={seed}"


def test_consistent_with_fixed_k_kcore(spark):
    from l_space_spark.operators.kcore import kcore

    rng = random.Random(4)
    pairs = [(rng.randrange(18), rng.randrange(18)) for _ in range(40)]
    got, _ = _run(spark, pairs)
    k = 2
    members = {
        r["id"] for r in kcore(
            spark, edges_df(spark, pairs), k=k, resume=False,
            num_partitions=4,
        ).state.where("core_deg >= 2").collect()
    }
    assert members == {v for v, c in got.items() if c >= k}
