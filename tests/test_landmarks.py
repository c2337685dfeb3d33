"""Landmark distance oracle: python twin + bound semantics."""

from collections import deque

from pyspark.sql import functions as F

from l_space_spark.operators.landmarks import (
    distance_bounds, landmark_distances, select_landmarks,
    undirected_closure,
)

from conftest import edges_df


def _bfs(adj, src, horizon):
    dist = {src: 0}
    q = deque([src])
    while q:
        u = q.popleft()
        if dist[u] == horizon:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def twin(pairs, k, horizon, queries):
    links = {(a, b) for a, b in pairs if a != b}
    adj = {}
    for a, b in links:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lms = sorted(adj, key=lambda x: (-len(adj[x]), x))[:k]
    d = {lm: _bfs(adj, lm, horizon) for lm in lms}
    out = {}
    for u, v in queries:
        cands = [d[lm][u] + d[lm][v] for lm in lms
                 if u in d[lm] and v in d[lm]]
        out[(u, v)] = min(cands) if cands else None
    return out


def _run(spark, pairs, k=2, horizon=4):
    e = edges_df(spark, pairs)
    dists = landmark_distances(spark, e, n_landmarks=k, max_iters=horizon,
                               resume=False)
    und = undirected_closure(e)
    ids = sorted(r["src"] for r in und.select("src").distinct().collect())
    queries = [(u, v) for i, u in enumerate(ids) for v in ids[i + 1:]]
    qdf = spark.createDataFrame(queries, "u long, v long")
    got = {(r["u"], r["v"]): r["bound"]
           for r in distance_bounds(dists, qdf).collect()}
    return got, twin(pairs, k, horizon, queries)


def test_path_graph_exact_from_end_landmark(spark):
    # path 0-1-2-3-4 plus a hub 0 with extra spokes so landmark = 0
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (0, 6)]
    got, want = _run(spark, pairs, k=1, horizon=5)
    assert got == want
    # bound through landmark 0 for (1, 2) is d(1,0)+d(0,2) = 3 ≥ true 1
    assert got[(1, 2)] == 3


def test_matches_python_twin_random(spark):
    import random

    rng = random.Random(7)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(40)]
    pairs = [p for p in pairs if p[0] != p[1]]
    got, want = _run(spark, pairs, k=3, horizon=4)
    assert got == want


def test_disconnected_pair_is_null(spark):
    # two components; single landmark lands in the bigger one
    pairs = [(0, 1), (1, 2), (0, 2), (10, 11)]
    got, want = _run(spark, pairs, k=1, horizon=4)
    assert got == want
    assert got[(0, 10)] is None and got[(0, 1)] is not None


def test_landmark_selection_degree_then_id(spark):
    pairs = [(0, 1), (0, 2), (0, 3), (5, 1), (5, 2), (5, 3), (7, 1)]
    und = undirected_closure(edges_df(spark, pairs))
    lms = sorted(r["id"] for r in select_landmarks(und, 2).collect())
    # degrees: 0→3, 5→3, 1→3, 2/3→2, 7→1; ties at 3 break by lowest id
    assert lms == [0, 1]
