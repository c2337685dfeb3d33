"""Sampled bounded-depth Brandes betweenness vs a python twin."""

import hashlib
import random
from collections import defaultdict

from l_space_spark.operators.betweenness import betweenness_sampled

from conftest import edges_df

E9 = 1_000_000_000


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def twin(pairs, n_sources, depth, seed="bc"):
    adj = defaultdict(set)
    verts = set()
    for s, d in pairs:
        verts.update((s, d))
        if s != d:
            adj[s].add(d)
    srcs = sorted(verts, key=lambda v: (h60(f"{seed}:{v}"), v))[:n_sources]
    bc = {v: 0 for v in verts}
    for s in srcs:
        levels = [{s: 1}]
        seen = {s}
        for _ in range(depth):
            nxt = defaultdict(int)
            for v, sig in levels[-1].items():
                for w in adj[v]:
                    if w not in seen:
                        nxt[w] += sig
            if not nxt:
                break
            levels.append(dict(nxt))
            seen |= set(nxt)
        delta = [dict.fromkeys(lv, 0) for lv in levels]
        for l in range(len(levels) - 2, 0, -1):
            for v, sig_v in levels[l].items():
                acc = 0
                for w in adj[v]:
                    if w in levels[l + 1]:
                        acc += (sig_v * (E9 + delta[l + 1][w])) \
                            // levels[l + 1][w]
                delta[l][v] = acc
        for l in range(1, len(levels)):
            for v, dl in delta[l].items():
                bc[v] += dl
    return bc


def _run(spark, pairs, **kw):
    df = betweenness_sampled(spark, edges_df(spark, pairs),
                             num_partitions=4, **kw)
    return {r["id"]: r["bc_e9"] for r in df.collect()}


def test_path_graph_exact_values(spark):
    # directed path 0->1->2->3->4, all vertices as sources, full depth:
    # sigma == 1 everywhere so fixed-point == exact: bc(v) = #(s,t) pairs
    # with s < v < t = v * (4 - v)
    pairs = [(i, i + 1) for i in range(4)]
    got = _run(spark, pairs, n_sources=5, max_depth=4)
    assert got == {v: v * (4 - v) * E9 for v in range(5)}


def test_depth_bound_truncates(spark):
    pairs = [(i, i + 1) for i in range(4)]
    got = _run(spark, pairs, n_sources=5, max_depth=1)
    assert got == {v: 0 for v in range(5)}  # no 2-hop paths => no middles
    assert got == twin(pairs, 5, 1)


def test_diamond_split_paths(spark):
    # 0->{1,2}->3: sigma(3)=2, each middle gets 0.5
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3)]
    got = _run(spark, pairs, n_sources=4, max_depth=4)
    assert got == twin(pairs, 4, 4)
    assert got[1] == got[2] == E9 // 2


def test_random_graphs_match_twin(spark):
    for seed, n, m in [(1, 15, 30), (2, 25, 50)]:
        rng = random.Random(seed)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        got = _run(spark, pairs, n_sources=6, max_depth=3)
        assert got == twin(pairs, 6, 3), f"seed={seed}"


from l_space_spark.operators.betweenness import (  # noqa: E402
    edge_betweenness_sampled,
)


def edge_twin(pairs, n_sources, depth, seed="bc"):
    adj = defaultdict(set)
    verts = set()
    for s, d in pairs:
        verts.update((s, d))
        if s != d:
            adj[s].add(d)
    edges = {(s, d) for s, d in pairs if s != d}
    srcs = sorted(verts, key=lambda v: (h60(f"{seed}:{v}"), v))[:n_sources]
    ebc = dict.fromkeys(edges, 0)
    for s in srcs:
        levels = [{s: 1}]
        seen = {s}
        for _ in range(depth):
            nxt = defaultdict(int)
            for v, sig in levels[-1].items():
                for w in adj[v]:
                    if w not in seen:
                        nxt[w] += sig
            if not nxt:
                break
            levels.append(dict(nxt))
            seen |= set(nxt)
        delta = [dict.fromkeys(lv, 0) for lv in levels]
        # edge terms include level 0 (edges out of the source count)
        for l in range(len(levels) - 2, -1, -1):
            for v, sig_v in levels[l].items():
                acc = 0
                for w in adj[v]:
                    if w in levels[l + 1]:
                        term = (sig_v * (E9 + delta[l + 1][w])) \
                            // levels[l + 1][w]
                        ebc[(v, w)] += term
                        acc += term
            # vertex deltas still needed for the recursion (not at l=0)
            if l >= 1:
                for v, sig_v in levels[l].items():
                    acc = 0
                    for w in adj[v]:
                        if w in levels[l + 1]:
                            acc += (sig_v * (E9 + delta[l + 1][w])) \
                                // levels[l + 1][w]
                    delta[l][v] = acc
    return ebc


def _run_edges(spark, pairs, **kw):
    df = edge_betweenness_sampled(spark, edges_df(spark, pairs),
                                  num_partitions=4, **kw)
    return {(r["src"], r["dst"]): r["ebc_e9"] for r in df.collect()}


def test_edge_path_graph_exact_values(spark):
    # directed path 0->1->2->3->4, all sources, full depth: edge (v,v+1)
    # lies on every s<=v to t>v path: ebc = (v+1)*(4-v)
    pairs = [(i, i + 1) for i in range(4)]
    got = _run_edges(spark, pairs, n_sources=5, max_depth=4)
    assert got == {(v, v + 1): (v + 1) * (4 - v) * E9 for v in range(4)}


def test_edge_diamond_split(spark):
    # 0->1, 0->2, 1->3, 2->3: from source 0, each branch carries half
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3)]
    got = _run_edges(spark, pairs, n_sources=4, max_depth=4)
    assert got == edge_twin(pairs, 4, 4)


def test_edge_random_graphs_match_twin(spark):
    for seed, n, m in [(21, 14, 30), (22, 10, 40)]:
        rng = random.Random(seed)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        got = _run_edges(spark, pairs, n_sources=6, max_depth=3)
        assert got == edge_twin(pairs, 6, 3), f"seed={seed}"
