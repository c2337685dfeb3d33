"""Locally-dominant maximal matching: matching + maximality properties,
python greedy-twin equality (the equivalence the SQL oracle relies on)."""

import hashlib
import random

from l_space_spark.operators.matching import maximal_matching

from conftest import edges_df


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def greedy(pairs, seed="match"):
    canon = sorted(
        {(min(s, d), max(s, d)) for s, d in pairs if s != d},
        key=lambda e: (h60(f"{seed}:{e[0]}:{e[1]}"), e[0], e[1]),
    )
    used, matched = set(), []
    for a, b in canon:
        if a not in used and b not in used:
            used.update((a, b))
            matched.append((a, b))
    return sorted(matched)


def _run(spark, pairs, rounds=20, **kw):
    res = maximal_matching(
        spark, edges_df(spark, pairs), max_rounds=rounds,
        num_partitions=4, **kw
    )
    rows = res.state.collect()
    matched = sorted((r["a"], r["b"]) for r in rows if r["st"] == 1)
    live = [(r["a"], r["b"]) for r in rows if r["st"] == 0]
    return matched, live, res


def _check_valid(pairs, matched):
    canon = {(min(s, d), max(s, d)) for s, d in pairs if s != d}
    used = set()
    for a, b in matched:
        assert (a, b) in canon
        assert a not in used and b not in used, "two matched edges share a vertex"
        used.update((a, b))
    # maximality: every edge has at least one matched endpoint
    for a, b in canon:
        assert a in used or b in used, f"({a},{b}) extends the matching"


def test_triangle_one_edge(spark):
    pairs = [(0, 1), (1, 2), (2, 0)]
    matched, live, res = _run(spark, pairs)
    assert res.converged and not live
    assert len(matched) == 1
    _check_valid(pairs, matched)
    assert matched == greedy(pairs)


def test_path_and_self_loop(spark):
    # P4 plus a self-loop (dropped) and a duplicate/reversed edge
    pairs = [(0, 1), (1, 2), (2, 3), (3, 3), (2, 1)]
    matched, live, res = _run(spark, pairs)
    assert res.converged and not live
    _check_valid(pairs, matched)
    assert matched == greedy(pairs)


def test_star_single_edge(spark):
    pairs = [(0, i) for i in range(1, 9)]
    matched, live, res = _run(spark, pairs)
    assert res.converged and not live
    assert len(matched) == 1 and matched[0][0] == 0
    assert matched == greedy(pairs)


def test_random_graphs_match_greedy_twin(spark):
    for seed, n, m in [(1, 20, 35), (2, 40, 60), (3, 15, 60)]:
        rng = random.Random(seed)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        matched, live, res = _run(spark, pairs)
        assert res.converged and not live
        _check_valid(pairs, matched)
        assert matched == greedy(pairs)
