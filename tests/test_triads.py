"""Triad census vs an independent brute-force classifier (direct
edge-set isomorphism per triple — no shared code table), plus the
published class multiplicities and census identities."""

import random
from itertools import combinations, permutations

from l_space_spark.operators.triads import (
    CODE_TO_TYPE,
    TRIAD_TYPES,
    _MULTIPLICITY,
    _REPS,
    triad_census,
)

from conftest import edges_df


def _classify(tri_edges):
    """Name a triple's induced edge set by trying all vertex
    permutations against the representative edge sets."""
    for name, rep in _REPS.items():
        rset = set(rep)
        for p in permutations(range(3)):
            if {(p[i], p[j]) for i, j in tri_edges} == rset:
                return name
    raise AssertionError(tri_edges)


def brute_census(pairs):
    es = {(s, d) for s, d in pairs if s != d}
    vs = sorted({v for e in es for v in e})
    idx = {v: i for i, v in enumerate(vs)}
    out = {t: 0 for t in TRIAD_TYPES}
    for tri in combinations(vs, 3):
        local = {v: k for k, v in enumerate(tri)}
        te = {(local[s], local[d]) for s, d in es
              if s in local and d in local}
        out[_classify(te)] += 1
    return out


def test_code_table_multiplicities():
    counts = {t: 0 for t in TRIAD_TYPES}
    for name in CODE_TO_TYPE.values():
        counts[name] += 1
    assert counts == _MULTIPLICITY


def test_known_micrographs(spark):
    def census(pairs):
        return {r["triad_type"]: r["count"]
                for r in triad_census(spark, edges_df(spark, pairs)).collect()}

    # directed 3-cycle
    assert census([(0, 1), (1, 2), (2, 0)])["030C"] == 1
    # transitive triangle
    got = census([(0, 1), (0, 2), (1, 2)])
    assert got["030T"] == 1 and got["030C"] == 0
    # chain on 4 vertices: triples {012}=021C {123}=021C {013},{023}=012
    got = census([(0, 1), (1, 2), (2, 3)])
    assert got["021C"] == 2 and got["012"] == 2 and got["003"] == 0
    # one mutual dyad + isolated-by-edges third parties
    got = census([(0, 1), (1, 0), (5, 6)])
    assert got["102"] == 2 and got["012"] == 2  # {0,1,x} and {5,6,x}


def test_random_graphs_match_brute(spark):
    for seed, n, m in ((1, 12, 40), (2, 9, 60), (3, 15, 25)):
        rng = random.Random(seed)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        got = {r["triad_type"]: r["count"]
               for r in triad_census(spark, edges_df(spark, pairs)).collect()}
        assert got == brute_census(pairs), (seed, got)


def test_census_sums_to_n_choose_3(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(70)]
    rows = triad_census(spark, edges_df(spark, pairs)).collect()
    n = len({v for e in pairs for v in e if e[0] != e[1]})
    assert sum(r["count"] for r in rows) == n * (n - 1) * (n - 2) // 6
    assert [r["triad_type"] for r in rows] == list(TRIAD_TYPES)
