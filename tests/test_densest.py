"""Densest-subgraph peeling vs an exact python replay, plus the
2(1+ε)-approximation guarantee against the true optimum on small graphs."""

import itertools
import random

from l_space_spark.operators.densest import densest_subgraph, density_e6

from conftest import edges_df


def brute_peel(pairs, num=3, den=2):
    """Integer-exact python twin of operators/densest.py."""
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    vs = {v for e in es for v in e}
    rounds, sets = [], []
    r = 0
    while vs:
        ne = len(es)
        rounds.append((r, len(vs), ne))
        sets.append(set(vs))
        deg = {v: 0 for v in vs}
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        t2 = 2 * ne
        vs = {v for v in vs if deg[v] * len(deg) * den > num * t2}
        es = {(a, b) for a, b in es if a in vs and b in vs}
        r += 1
    best = -1
    for r, nv, ne in rounds:
        if best < 0 or ne * rounds[best][1] > rounds[best][2] * nv:
            best = r
    return rounds, best, (sets[best] if best >= 0 else set())


def true_max_density(pairs):
    """Exhaustive max |E(S)|/|S| over all subsets (tiny graphs only)."""
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    vs = sorted({v for e in es for v in e})
    best = 0.0
    for k in range(1, len(vs) + 1):
        for sub in itertools.combinations(vs, k):
            s = set(sub)
            ne = sum(1 for a, b in es if a in s and b in s)
            best = max(best, ne / len(s))
    return best


def _run(spark, pairs, **kw):
    r = densest_subgraph(spark, edges_df(spark, pairs), **kw)
    return (r.rounds, r.best_round,
            {x["v"] for x in r.members.collect()}, r)


def test_clique_plus_path_trace(spark):
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    pairs += [(4, 5), (5, 6), (6, 7)]
    rounds, best, members, _ = _run(spark, pairs)
    b_rounds, b_best, b_members = brute_peel(pairs)
    assert rounds == b_rounds and best == b_best and members == b_members
    assert rounds[0] == (0, 8, 13)
    # 2(1+eps) guarantee: found density >= optimum / 3 for eps=1/2
    found = rounds[best][2] / rounds[best][1]
    assert found * 3 >= true_max_density(pairs)


def test_random_graphs_match_replay(spark):
    for seed in (3, 4):
        rng = random.Random(seed)
        pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(90)]
        rounds, best, members, _ = _run(spark, pairs)
        b_rounds, b_best, b_members = brute_peel(pairs)
        assert rounds == b_rounds and best == b_best
        assert members == b_members


def test_tighter_epsilon_finds_denser_core(spark):
    # planted K6 inside a sparse ring: eps=1/4 (num=5, den=4) must return
    # a set at least as dense as eps=1/2's, and the brute twin agrees
    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    pairs += [(10 + i, 10 + (i + 1) % 40) for i in range(40)]
    pairs += [(0, 10), (1, 20), (2, 30)]
    r_coarse = brute_peel(pairs, 3, 2)
    rounds, best, members, _ = _run(spark, pairs, eps_num=5, eps_den=4)
    b_rounds, b_best, b_members = brute_peel(pairs, 5, 4)
    assert rounds == b_rounds and members == b_members
    dense = rounds[best]
    coarse = r_coarse[0][r_coarse[1]]
    assert dense[2] * coarse[1] >= coarse[2] * dense[1]
    assert members == set(range(6))  # the planted clique, exactly


def test_empty_and_selfloop_only(spark):
    rounds, best, members, _ = _run(spark, [(1, 1), (2, 2)])
    assert rounds == [] and best == -1 and members == set()


def test_density_e6_is_rounded(spark):
    assert density_e6(3, 5) == 1_666_667
    assert density_e6(2, 1) == 500_000
    assert density_e6(4, 2) == 500_000


def test_checkpoint_resume(spark, tmp_path):
    import os

    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    pairs += [(4, 5), (5, 6), (6, 7)]
    ck = str(tmp_path / "peel")
    rounds, best, members, r = _run(spark, pairs, checkpoint_dir=ck)
    assert r.superstep.resumed_from is None
    # resume of a CONVERGED run executes no superstep yet reconstructs
    # the identical trace + winner from the sidecar
    r2 = densest_subgraph(spark, edges_df(spark, pairs), checkpoint_dir=ck)
    assert r2.superstep.resumed_from is not None
    assert r2.rounds == rounds and r2.best_round == best
    assert {x["v"] for x in r2.members.collect()} == members
    # sidecar loss: full deterministic recompute, same answer
    os.remove(os.path.join(ck, "peel_rounds.json"))
    r3 = densest_subgraph(spark, edges_df(spark, pairs), checkpoint_dir=ck)
    assert r3.rounds == rounds and r3.best_round == best
    assert {x["v"] for x in r3.members.collect()} == members


def test_resume_false_forces_clean_recompute(spark, tmp_path):
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    ck = str(tmp_path / "peel2")
    r1 = densest_subgraph(spark, edges_df(spark, pairs), checkpoint_dir=ck)
    assert r1.superstep.resumed_from is None
    r2 = densest_subgraph(spark, edges_df(spark, pairs), checkpoint_dir=ck,
                          resume=False)
    assert r2.superstep.resumed_from is None
    assert r2.rounds == r1.rounds and r2.best_round == r1.best_round
