"""Bridges + 2-edge-connected components vs a ground-truth python twin
(per-edge removal reachability — the definition, not the algorithm)."""

import random
from collections import defaultdict, deque

from l_space_spark.operators.bridges import bridges, two_edge_components

from conftest import edges_df


def _adj(pairs):
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return adj


def _reach(adj, start, banned):
    seen = {start}
    q = deque([start])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if (u, v) in banned or (v, u) in banned or v in seen:
                continue
            seen.add(v)
            q.append(v)
    return seen


def true_bridges(pairs):
    adj = _adj(pairs)
    canon = {(min(a, b), max(a, b)) for a in adj for b in adj[a]}
    return sorted(
        (a, b) for a, b in canon if b not in _reach(adj, a, {(a, b)})
    )


def true_2ecc(pairs):
    adj = _adj(pairs)
    br = set(true_bridges(pairs))
    lab = {}
    for v in sorted(adj):
        if v not in lab:
            for w in _reach(adj, v, br):
                lab[w] = v
    return lab


def _bridges(spark, pairs):
    return sorted(
        (r["a"], r["b"])
        for r in bridges(spark, edges_df(spark, pairs),
                         num_partitions=4).collect()
    )


def test_path_all_bridges(spark):
    pairs = [(i, i + 1) for i in range(8)]
    assert _bridges(spark, pairs) == [(i, i + 1) for i in range(8)]


def test_cycle_no_bridges(spark):
    pairs = [(i, (i + 1) % 7) for i in range(7)]
    assert _bridges(spark, pairs) == []


def test_barbell_middle_is_bridge(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)]
    assert _bridges(spark, pairs) == [(3, 4)]


def test_pendant_and_parallel_and_self_loop(spark):
    # parallel duplicates collapse, self-loops are inert
    pairs = [(1, 2), (2, 1), (2, 3), (3, 1), (3, 3), (3, 9)]
    assert _bridges(spark, pairs) == [(3, 9)]


def test_random_matches_definition(spark):
    for seed, n, m in ((1, 20, 24), (2, 30, 33), (3, 40, 44)):
        rng = random.Random(seed)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        assert _bridges(spark, pairs) == true_bridges(pairs), f"seed {seed}"


def test_two_edge_components(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)]
    got = {r["id"]: r["comp2"]
           for r in two_edge_components(spark, edges_df(spark, pairs),
                                        num_partitions=4).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}


def test_two_edge_components_random(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(28)]
    got = {r["id"]: r["comp2"]
           for r in two_edge_components(spark, edges_df(spark, pairs),
                                        num_partitions=4).collect()}
    assert got == true_2ecc(pairs)


def test_jobspec_kinds(spark, tmp_path):
    from l_space_spark.jobspec import run_job

    pairs = [(1, 2), (2, 3), (3, 1), (3, 4)]
    p = str(tmp_path / "bedges")
    edges_df(spark, pairs).write.parquet(p)
    out = run_job(spark, {"kind": "algorithm", "algorithm": "bridges",
                          "input": {"edges_parquet": p}, "params": {}})
    assert [(r["a"], r["b"]) for r in out.collect()] == [(3, 4)]
    out2 = run_job(spark, {"kind": "algorithm",
                           "algorithm": "two_edge_components",
                           "input": {"edges_parquet": p}, "params": {}})
    got = {r["id"]: r["comp2"] for r in out2.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4}


def test_negative_vertex_ids(spark):
    # roots are NULL-parent internally, not a -1 sentinel: a graph
    # whose component min is negative (or contains vertex -1) must
    # report every bridge
    pairs = [(-5, 3), (3, 7)]
    assert _bridges(spark, pairs) == [(-5, 3), (3, 7)]
    pairs = [(-1, 0), (0, 1), (1, -1), (1, 2)]
    assert _bridges(spark, pairs) == [(1, 2)]
