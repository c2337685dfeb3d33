"""Louvain phase-1 vs an independent python twin + semantic checks."""

import os
import random
import shutil
from collections import defaultdict

from pyspark.sql import functions as F

from l_space_spark.operators.louvain import louvain_communities

from conftest import edges_df


def louvain_twin(pairs, rounds):
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    deg = {v: len(adj[v]) for v in adj}
    m2 = sum(deg.values())
    com = {v: v for v in adj}
    for t in range(rounds):
        vol = defaultdict(int)
        anch = set()
        for v in adj:
            vol[com[v]] += deg[v]
            if (v & 1) != (t % 2):
                anch.add(com[v])
        new = dict(com)
        for v in adj:
            if (v & 1) != (t % 2):
                continue
            kvc = defaultdict(int)
            for u in adj[v]:
                kvc[com[u]] += 1
            kvc.setdefault(com[v], 0)
            best, best_score = None, None
            for c in sorted(kvc):
                if c not in anch and c != com[v]:
                    continue
                tot = vol[c] - (deg[v] if c == com[v] else 0)
                score = m2 * kvc[c] - deg[v] * tot
                if best_score is None or score > best_score:
                    best, best_score = c, score
            new[v] = best
        com = new
    return com


def run(spark, pairs, rounds, **kw):
    res = louvain_communities(spark, edges_df(spark, pairs),
                              max_iters=rounds, fixed_iters=True,
                              resume=False, num_partitions=4, **kw)
    return {r["id"]: r["com"] for r in res.state.collect()}


def test_two_cliques_with_bridge(spark):
    # K4 on 0..3 and K4 on 10..13 joined by one edge: phase 1 must
    # recover the two cliques as communities
    k = lambda off: [(a + off, b + off) for a in range(4)
                     for b in range(a + 1, 4)]
    pairs = k(0) + k(10) + [(3, 10)]
    got = run(spark, pairs, 8)
    assert got == louvain_twin(pairs, 8)
    left = {got[v] for v in (0, 1, 2, 3)}
    right = {got[v] for v in (10, 11, 12, 13)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_random_matches_twin(spark):
    rnd = random.Random(23)
    pairs = [(rnd.randrange(40), rnd.randrange(40)) for _ in range(150)]
    for rounds in (1, 2, 5):
        assert run(spark, pairs, rounds) == louvain_twin(pairs, rounds)


def test_metric_mode_stops_and_agrees_on_cliques(spark):
    k = lambda off: [(a + off, b + off) for a in range(4)
                     for b in range(a + 1, 4)]
    pairs = k(0) + k(10) + [(3, 10)]
    res = louvain_communities(spark, edges_df(spark, pairs),
                              max_iters=20, resume=False, num_partitions=4)
    assert res.converged and res.iterations < 20
    got = {r["id"]: r["com"] for r in res.state.collect()}
    left = {got[v] for v in (0, 1, 2, 3)}
    right = {got[v] for v in (10, 11, 12, 13)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_kill_and_resume(spark, tmp_path):
    rnd = random.Random(5)
    pairs = [(rnd.randrange(30), rnd.randrange(30)) for _ in range(90)]
    e = edges_df(spark, pairs)
    want = {tuple(r) for r in louvain_communities(
        spark, e, max_iters=6, fixed_iters=True, resume=False,
        num_partitions=4).state.collect()}
    ck = str(tmp_path / "ck_louvain")
    louvain_communities(spark, e, max_iters=6, fixed_iters=True,
                        checkpoint_dir=ck, resume=False, num_partitions=4)
    for i in (3, 4, 5):
        d = os.path.join(ck, f"state_{i:05d}")
        if os.path.isdir(d):
            shutil.rmtree(d)
    resumed = louvain_communities(spark, e, max_iters=6, fixed_iters=True,
                                  checkpoint_dir=ck, resume=True,
                                  num_partitions=4)
    assert resumed.resumed_from == 2
    assert {tuple(r) for r in resumed.state.collect()} == want


def test_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert louvain_communities(spark, empty, max_iters=2, fixed_iters=True,
                               resume=False,
                               num_partitions=2).state.count() == 0
    loops = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    assert louvain_communities(spark, loops, max_iters=2, fixed_iters=True,
                               resume=False,
                               num_partitions=2).state.count() == 0


# ---- weighted phase (louvain_weighted) ----

def louvain_weighted_twin(wrows, rounds):
    """wrows: (a, b, w) any orientation, self-loops allowed."""
    W = defaultdict(int)
    for a, b, w in wrows:
        W[(min(a, b), max(a, b))] += w
    adj = defaultdict(dict)
    selfw = defaultdict(int)
    for (a, b), w in W.items():
        if a == b:
            selfw[a] += w
        else:
            adj[a][b] = adj[a].get(b, 0) + w
            adj[b][a] = adj[b].get(a, 0) + w
    verts = set(selfw) | set(adj)
    stg = {v: sum(adj[v].values()) + 2 * selfw[v] for v in verts}
    m2 = sum(stg.values())
    com = {v: v for v in verts}
    for t in range(rounds):
        vol = defaultdict(int)
        anch = set()
        for v in verts:
            vol[com[v]] += stg[v]
            if (v & 1) != (t % 2):
                anch.add(com[v])
        new = dict(com)
        for v in verts:
            if (v & 1) != (t % 2):
                continue
            kvc = defaultdict(int)
            for u, w in adj[v].items():
                kvc[com[u]] += w
            kvc.setdefault(com[v], 0)
            best, best_score = None, None
            for c in sorted(kvc):
                if c not in anch and c != com[v]:
                    continue
                tot = vol[c] - (stg[v] if c == com[v] else 0)
                score = m2 * kvc[c] - stg[v] * tot
                if best_score is None or score > best_score:
                    best, best_score = c, score
            new[v] = best
        com = new
    return com


def test_weighted_random_matches_twin(spark):
    from l_space_spark.operators.louvain import louvain_weighted

    rnd = random.Random(31)
    wrows = [(rnd.randrange(20), rnd.randrange(20), rnd.randrange(1, 5))
             for _ in range(60)]  # duplicates + self-loops included
    df = spark.createDataFrame(wrows, "src long, dst long, w long")
    for rounds in (1, 2, 4):
        got = {r["id"]: r["com"] for r in louvain_weighted(
            spark, df, max_iters=rounds, fixed_iters=True,
            resume=False, num_partitions=4).state.collect()}
        assert got == louvain_weighted_twin(wrows, rounds), rounds


def test_weighted_unit_weights_equal_phase1(spark):
    # w=1 on a simple graph: weighted phase == unweighted phase 1
    from l_space_spark.operators.louvain import louvain_weighted

    rnd = random.Random(13)
    pairs = sorted({(min(a, b), max(a, b)) for a, b in
                    ((rnd.randrange(25), rnd.randrange(25))
                     for _ in range(80)) if a != b})
    df = spark.createDataFrame([(a, b, 1) for a, b in pairs],
                               "src long, dst long, w long")
    got_w = {r["id"]: r["com"] for r in louvain_weighted(
        spark, df, max_iters=4, fixed_iters=True, resume=False,
        num_partitions=4).state.collect()}
    assert got_w == run(spark, pairs, 4)


def modularity_q(pairs, com):
    """Q of a partition of the simple graph (python twin, exact ints:
    returns (num, den) with Q = num/den)."""
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    deg = {v: len(adj[v]) for v in adj}
    m2 = sum(deg.values())
    intra = defaultdict(int)
    vol = defaultdict(int)
    for v in adj:
        vol[com[v]] += deg[v]
        for u in adj[v]:
            if com[u] == com[v]:
                intra[com[v]] += 1
    num = sum(intra[c] * m2 - vol[c] * vol[c] for c in vol)
    return num, m2 * m2


def test_multilevel_merges_ring_of_triangles(spark):
    # 6 triangles in a ring, weak single-edge links between consecutive
    # triangles: phase 1 finds the 6 triangles; phase 2 on the quotient
    # must not fragment them, and composed Q must be >= phase-1 Q
    from l_space_spark.operators.louvain import (louvain_communities,
                                                 louvain_weighted)

    tris, pairs = [], []
    for i in range(6):
        base = i * 10
        tris.append((base, base + 1, base + 2))
        pairs += [(base, base + 1), (base + 1, base + 2),
                  (base, base + 2)]
    for i in range(6):
        pairs.append((i * 10 + 2, ((i + 1) % 6) * 10))
    e = edges_df(spark, pairs)
    res1 = louvain_communities(spark, e, max_iters=8, fixed_iters=True,
                               resume=False, num_partitions=4)
    com1 = {r["id"]: r["com"] for r in res1.state.collect()}
    assert len({com1[v] for t in tris for v in t}) == 6
    for a, b, c in tris:
        assert com1[a] == com1[b] == com1[c]
    # quotient (w = closure msgs / 2) + weighted phase
    W = defaultdict(int)
    adj = defaultdict(set)
    for s, d in pairs:
        adj[s].add(d)
        adj[d].add(s)
    for v in adj:
        for u in adj[v]:
            ca, cb = com1[v], com1[u]
            W[(min(ca, cb), max(ca, cb))] += 1
    wrows = [(a, b, w // 2) for (a, b), w in sorted(W.items())]
    df = spark.createDataFrame(wrows, "src long, dst long, w long")
    res2 = louvain_weighted(spark, df, max_iters=6, fixed_iters=True,
                            resume=False, num_partitions=4)
    com2q = {r["id"]: r["com"] for r in res2.state.collect()}
    assert com2q == louvain_weighted_twin(wrows, 6)
    com2 = {v: com2q[com1[v]] for v in com1}
    # no triangle is ever split by phase 2
    for a, b, c in tris:
        assert com2[a] == com2[b] == com2[c]
    n1, d1 = modularity_q(pairs, com1)
    n2, d2 = modularity_q(pairs, com2)
    assert n2 * d1 >= n1 * d2  # composed Q >= phase-1 Q


def refine_twin(pairs, parent_rounds, refine_rounds):
    """Python twin of refine_communities: louvain moves restricted to
    intra-parent edges from singletons; no-intra-edge vertices stay
    singletons."""
    parent = louvain_twin(pairs, parent_rounds)
    intra = [(a, b) for a, b in pairs
             if a != b and a in parent and parent[a] == parent[b]]
    ref = louvain_twin(intra, refine_rounds)
    return {v: ref.get(v, v) for v in parent}


def run_refined(spark, pairs, parent_rounds, refine_rounds):
    from l_space_spark.operators.louvain import refine_communities

    e = edges_df(spark, pairs)
    parent = louvain_communities(
        spark, e, max_iters=parent_rounds, fixed_iters=True,
        resume=False, num_partitions=4,
    ).state
    res = refine_communities(spark, e, parent, max_iters=refine_rounds,
                             fixed_iters=True, resume=False,
                             num_partitions=4)
    return ({r["id"]: r["com"] for r in res.state.collect()},
            {r["id"]: r["com"] for r in parent.collect()})


def test_refine_matches_twin_random(spark):
    rnd = random.Random(31)
    pairs = [(rnd.randrange(30), rnd.randrange(30)) for _ in range(90)]
    got, _ = run_refined(spark, pairs, 4, 3)
    assert got == refine_twin(pairs, 4, 3)


def test_refine_is_connected_subpartition(spark):
    """The Leiden guarantees: every refined community lies inside one
    parent community AND is connected on the intra edges."""
    rnd = random.Random(57)
    pairs = [(rnd.randrange(25), rnd.randrange(25)) for _ in range(60)]
    got, parent = run_refined(spark, pairs, 6, 6)
    assert set(got) == set(parent)
    # subset: a refined community never spans two parent communities
    rc_parent = defaultdict(set)
    for v, rc in got.items():
        rc_parent[rc].add(parent[v])
    assert all(len(ps) == 1 for ps in rc_parent.values())
    # connectivity on intra-parent edges (union-find per refined com)
    intra = [(a, b) for a, b in pairs
             if a != b and parent[a] == parent[b]]
    uf = {}

    def find(x):
        while uf.setdefault(x, x) != x:
            uf[x] = uf[uf[x]]
            x = uf[x]
        return x

    members = defaultdict(set)
    for v, rc in got.items():
        members[rc].add(v)
    for a, b in intra:
        if got[a] == got[b]:
            uf[find(a)] = find(b)
    for rc, vs in members.items():
        roots = {find(v) for v in vs}
        assert len(roots) == 1, f"refined community {rc} disconnected"


def test_refine_two_cliques_bridge_vertexless_parent(spark):
    # one parent community containing two K4s joined by a single edge:
    # refinement from singletons keeps each clique coherent and every
    # refined community inside the parent
    k = lambda off: [(a + off, b + off) for a in range(4)
                     for b in range(a + 1, 4)]
    pairs = k(0) + k(10) + [(3, 10)]
    got, parent = run_refined(spark, pairs, 1, 8)
    assert got == refine_twin(pairs, 1, 8)
