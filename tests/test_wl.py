"""WL color refinement vs an exact python twin + structural properties."""

import hashlib
import random

from l_space_spark.operators.wl import SUMMAND_MOD, wl_refinement

from conftest import edges_df


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def twin(pairs, rounds):
    adj = {}
    for s, d in pairs:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    color = {v: len(ns) for v, ns in adj.items()}
    for _ in range(rounds):
        color = {
            v: h60(
                f"{color[v]}:"
                f"{sum(h60(str(color[n])) % SUMMAND_MOD for n in ns)}:"
                f"{len(ns)}"
            )
            for v, ns in adj.items()
        }
    return color


def _run(spark, pairs, rounds, **kw):
    res = wl_refinement(spark, edges_df(spark, pairs), max_iters=rounds,
                        fixed_iters=True, resume=False, num_partitions=4,
                        **kw)
    return {r["id"]: r["color"] for r in res.state.collect()}


def test_cycle_stays_monochrome(spark):
    # every vertex of C5 is structurally identical: one class forever
    pairs = [(i, (i + 1) % 5) for i in range(5)]
    got = _run(spark, pairs, 3)
    assert got == twin(pairs, 3)
    assert len(set(got.values())) == 1


def test_path_symmetry_classes(spark):
    # P4 a-b-c-d: ends {a,d} and middles {b,c} are WL-equivalent
    pairs = [(0, 1), (1, 2), (2, 3)]
    got = _run(spark, pairs, 3)
    assert got == twin(pairs, 3)
    assert got[0] == got[3] and got[1] == got[2] and got[0] != got[1]


def test_random_matches_twin(spark):
    rng = random.Random(23)
    pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(45)]
    for rounds in (1, 3):
        assert _run(spark, pairs, rounds) == twin(pairs, rounds)


def test_refinement_only_splits_classes(spark):
    # the round-k partition refines round-(k-1): same color at k implies
    # same color at k-1 (classes split, never merge)
    rng = random.Random(31)
    pairs = [(rng.randrange(15), rng.randrange(15)) for _ in range(30)]
    prev = _run(spark, pairs, 1)
    cur = _run(spark, pairs, 2)
    by_cur = {}
    for v, c in cur.items():
        by_cur.setdefault(c, set()).add(prev[v])
    assert all(len(s) == 1 for s in by_cur.values())


def test_metric_mode_stops_when_partition_stable(spark):
    # P4 stabilizes at 2 classes after one round; metric mode must stop
    # well before max_iters and report convergence
    pairs = [(0, 1), (1, 2), (2, 3)]
    res = wl_refinement(spark, edges_df(spark, pairs), max_iters=10,
                        resume=False, num_partitions=4)
    assert res.converged and res.iterations < 10
    got = {r["id"]: r["color"] for r in res.state.collect()}
    assert got[0] == got[3] and got[1] == got[2] and got[0] != got[1]
