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
