"""Luby MIS: independence + maximality properties, python-twin equality."""

import hashlib
import random

from l_space_spark.operators.mis import maximal_independent_set

from conftest import edges_df


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def luby(pairs, rounds, seed="mis"):
    adj = {}
    verts = set()
    for s, d in pairs:
        verts.update((s, d))
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    st = {v: 0 for v in verts}
    for i in range(rounds):
        act = {v for v in verts if st[v] == 0}
        p = {v: h60(f"{seed}:{i}:{v}") for v in act}
        winners = {
            v for v in act
            if all(p[v] < p[u] for u in adj.get(v, ()) if u in act)
        }
        for w in winners:
            st[w] = 1
            for u in adj.get(w, ()):
                if st[u] == 0:
                    st[u] = 2
    return st


def _run(spark, pairs, rounds=8, **kw):
    res = maximal_independent_set(
        spark, edges_df(spark, pairs), max_rounds=rounds,
        num_partitions=4, **kw
    )
    return {r["id"]: r["st"] for r in res.state.collect()}, res


def _check_valid(pairs, st):
    mis = {v for v, s in st.items() if s == 1}
    adj = {}
    for s, d in pairs:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    # independence
    for v in mis:
        assert not (adj.get(v, set()) & mis), f"{v} has MIS neighbor"
    # maximality: every non-member has an MIS neighbor (or is undecided)
    for v, s in st.items():
        if s == 2:
            assert adj.get(v, set()) & mis, f"{v} excluded w/o MIS nbr"
        assert s != 0, f"{v} still undecided"


def test_triangle_one_member(spark):
    pairs = [(0, 1), (1, 2), (2, 0)]
    got, res = _run(spark, pairs)
    assert res.converged
    assert sorted(got.values()) == [1, 2, 2]
    _check_valid(pairs, got)


def test_star_center_or_leaves(spark):
    pairs = [(0, i) for i in range(1, 8)]
    got, _ = _run(spark, pairs)
    _check_valid(pairs, got)
    mis = {v for v, s in got.items() if s == 1}
    assert mis == {0} or mis == set(range(1, 8))


def test_isolated_and_self_loop_join(spark):
    got, _ = _run(spark, [(5, 5), (1, 2)])
    assert got[5] == 1  # self-loop vertex is isolated in the closure
    _check_valid([(1, 2)], {k: v for k, v in got.items() if k != 5})


def test_random_graphs_match_python_twin(spark):
    for seed, n, m in [(1, 20, 35), (2, 40, 60), (3, 15, 60)]:
        rng = random.Random(seed)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        got, res = _run(spark, pairs)
        assert got == luby(pairs, 8)
        _check_valid(pairs, got)
        assert res.converged
