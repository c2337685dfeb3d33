"""Trussness h-index dynamics vs exact truss peeling."""

import random
from itertools import combinations

from l_space_spark.operators.trussness import trussness

from conftest import edges_df


def canon(pairs):
    return {tuple(sorted(e)) for e in pairs if e[0] != e[1]}


def tris_of(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = set()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            out.add(tuple(sorted((a, b, c))))
    return out


def true_trussness(pairs):
    E = canon(pairs)
    tau = {}
    cur, k = set(E), 3
    while cur:
        while True:
            sup = {e: 0 for e in cur}
            for x, y, z in tris_of(cur):
                for e in ((x, y), (x, z), (y, z)):
                    sup[e] += 1
            drop = {e for e in cur if sup[e] < k - 2}
            if not drop:
                break
            cur -= drop
            for e in drop:
                tau[e] = k - 1
        k += 1
    for e in E:
        tau.setdefault(e, k - 1)
    return tau


def _run(spark, pairs, **kw):
    res = trussness(spark, edges_df(spark, pairs), num_partitions=4, **kw)
    return {(r["a"], r["b"]): r["t"] + 2 for r in res.state.collect()}, res


def test_clique_and_pendant(spark):
    k5 = list(combinations(range(5), 2))
    pairs = k5 + [(4, 10), (10, 11)]
    got, res = _run(spark, pairs)
    assert res.converged
    want = {e: 5 for e in map(tuple, k5)}
    want.update({(4, 10): 2, (10, 11): 2})
    assert got == want


def test_random_graphs_exact(spark):
    for seed, n, m in [(1, 12, 35), (2, 16, 50), (3, 9, 30)]:
        rng = random.Random(seed)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        got, res = _run(spark, pairs)
        assert res.converged, f"seed={seed}"
        assert got == true_trussness(pairs), f"seed={seed}"


def test_consistent_with_fixed_k_ktruss(spark):
    from l_space_spark.operators.ktruss import ktruss

    rng = random.Random(6)
    pairs = [(rng.randrange(12), rng.randrange(12)) for _ in range(40)]
    got, _ = _run(spark, pairs)
    k = 4
    kt = {(r["a"], r["b"]) for r in ktruss(
        spark, edges_df(spark, pairs), k=k, resume=False, num_partitions=4
    ).state.collect()}
    assert kt == {e for e, tau in got.items() if tau >= k}
