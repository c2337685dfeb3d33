"""Pure-Python/numpy oracles for the graph algorithms (no Spark).

Determinism rules (FIXTURES.md F4): synchronous updates, min-label/id
tie-breaks, summation over sorted neighbor lists.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

# ---------------------------------------------------------------- fixtures


def cycle(n: int) -> list[tuple[int, int]]:
    return [(i, (i + 1) % n) for i in range(n)]


def star(k: int) -> list[tuple[int, int]]:
    """k spokes (ids 1..k) each pointing at hub 0."""
    return [(i, 0) for i in range(1, k + 1)]


def two_cliques(k: int) -> list[tuple[int, int]]:
    e = []
    for base in (0, k):
        for i in range(k):
            for j in range(i + 1, k):
                e.append((base + i, base + j))
    return e


# F3 golden micro-graph (port of the reference social graph's `knows` edges,
# /root/reference/core/shared/src/main/scala/lspace/util/SampleGraph.scala:295-313)
KNOWS_EDGES = [
    (56789, 567),
    (56789, 34567),
    (34567, 567),
    (34567, 345),
    (345, 12345),
    (12345, 123),
]


# ---------------------------------------------------------------- oracles


def _clean(edges) -> list[tuple[int, int]]:
    return sorted({(s, d) for s, d in edges if s != d})


def pagerank_oracle(
    edges, damping=0.85, tol=1e-6, max_iters=100
) -> tuple[dict[int, float], int]:
    """Power iteration with dangling-mass redistribution; returns (ranks, iters)."""
    edges = _clean(edges)
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    it = 0
    for it in range(1, max_iters + 1):
        contrib = np.zeros(n)
        for s, d in edges:  # sorted order → deterministic summation
            contrib[idx[d]] += r[idx[s]] / out[idx[s]]
        mass = r[out == 0].sum()
        new = (1 - damping) / n + damping * (contrib + mass / n)
        delta = np.abs(new - r).sum()
        r = new
        if tol > 0 and delta <= tol:
            break
    return {v: float(r[idx[v]]) for v in verts}, it


def components_oracle(edges) -> dict[int, int]:
    """Min-id weakly connected component per vertex (union-find)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in _clean(edges):
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in parent}


def labelprop_oracle(edges, iters: int | None = None, max_iters=20) -> dict[int, int]:
    """Synchronous LP, max-count-then-min-label tie-break.

    ``iters`` pins an exact round count (fixed mode); else run to
    stability or max_iters.
    """
    adj = defaultdict(set)
    for s, d in _clean(edges):
        adj[s].add(d)
        adj[d].add(s)
    labels = {v: v for v in adj}
    rounds = iters if iters is not None else max_iters
    for _ in range(rounds):
        new = {}
        for v in adj:
            if not adj[v]:
                new[v] = labels[v]
                continue
            cnt = Counter(labels[u] for u in adj[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == labels and iters is None:
            break
        labels = new
    return labels


def triangles_oracle(edges) -> tuple[int, dict[int, int]]:
    """(global count, per-vertex counts) of the undirected simple graph."""
    adj = defaultdict(set)
    for s, d in _clean(edges):
        adj[s].add(d)
        adj[d].add(s)
    per = {v: 0 for v in adj}
    total = 0
    verts = sorted(adj)
    for a in verts:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    total += 1
                    per[a] += 1
                    per[b] += 1
                    per[c] += 1
    return total, per


def zipf_edges(n_repos=300, seed=42, max_degree=64) -> list[tuple[int, int]]:
    """Edge list of the synthetic repo graph (synth.expected_edges) by index."""
    from l_space_spark.synth import expected_edges

    return sorted(expected_edges(n_repos, seed, max_degree))
