"""Borůvka minimum spanning forest: exact forest on hand graphs, a python
Kruskal twin on random graphs (the total-order equivalence the minimax SQL
oracle relies on), forest-size/weight invariants, and kill-and-resume."""

import json
import os
import random

import pytest
from pyspark.sql import functions as F

from l_space_spark.operators.msf import forest_edges, minimum_spanning_forest


def wdf(spark, triples):
    return spark.createDataFrame(
        [(int(s), int(d), int(w)) for s, d, w in triples],
        "src long, dst long, w long",
    )


def kruskal(triples):
    """Python twin under the same (w, u, v) total order."""
    canon = {}
    for s, d, w in triples:
        if s == d:
            continue
        u, v = (s, d) if s < d else (d, s)
        if (u, v) not in canon or w < canon[(u, v)]:
            canon[(u, v)] = w
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = []
    for (u, v), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            forest.append((u, v, w))
    return sorted(forest)


def _run(spark, triples, **kw):
    res = minimum_spanning_forest(spark, wdf(spark, triples),
                                  num_partitions=4, **kw)
    got = sorted(tuple(r) for r in forest_edges(res).collect())
    return got, res


def test_hand_graph_exact(spark):
    triples = [(1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 4, 5), (4, 5, 4),
               (2, 4, 7), (8, 9, 1), (9, 8, 6)]  # parallel pair keeps min
    got, res = _run(spark, triples)
    assert got == [(1, 3, 1), (2, 3, 2), (3, 4, 5), (4, 5, 4), (8, 9, 1)]
    assert res.converged


def test_path_graph_all_edges(spark):
    got, res = _run(spark, [(i, i + 1, 100 + i) for i in range(40)])
    assert len(got) == 40  # every path edge is a bridge → all in forest
    assert res.converged


def test_duplicate_weights_total_order(spark):
    # every weight identical: the (w, u, v) tie-break still yields the
    # unique Kruskal-with-tie-break forest
    triples = [(a, b, 7) for a in range(6) for b in range(a + 1, 6)]
    got, _ = _run(spark, triples)
    assert got == kruskal(triples)
    assert len(got) == 5


@pytest.mark.parametrize("seed", [1, 2])
def test_random_graph_matches_kruskal(spark, seed):
    rng = random.Random(seed)
    triples = [
        (rng.randrange(60), rng.randrange(60), rng.randrange(1, 10**6))
        for _ in range(150)
    ]
    got, res = _run(spark, triples)
    want = kruskal(triples)
    assert got == want
    # invariant: |forest| = V − #components
    verts = {x for s, d, _ in triples if s != d for x in (s, d)}
    comp_parent = {}

    def find(x):
        while comp_parent.setdefault(x, x) != x:
            comp_parent[x] = comp_parent[comp_parent[x]]
            x = comp_parent[x]
        return x

    for s, d, _ in triples:
        if s != d:
            comp_parent[find(s)] = find(d)
    ncomp = len({find(x) for x in verts})
    assert len(got) == len(verts) - ncomp


def test_empty_and_self_loops(spark):
    got, res = _run(spark, [(5, 5, 1), (9, 9, 2)])
    assert got == []
    assert res.converged


def test_kill_and_resume(spark, tmp_path):
    rng = random.Random(7)
    triples = [
        (rng.randrange(200), rng.randrange(200), rng.randrange(1, 10**6))
        for _ in range(300)
    ]
    want = kruskal(triples)

    ck = str(tmp_path / "ck")
    full = minimum_spanning_forest(spark, wdf(spark, triples),
                                   num_partitions=4, checkpoint_dir=ck,
                                   resume=False)
    assert full.converged and full.iterations >= 2
    # "kill": drop every checkpoint after superstep 0, plus an incomplete
    # dir without _meta.json (crash mid-write) that resume must ignore
    import shutil

    for i in range(1, full.iterations):
        d = os.path.join(ck, f"state_{i:05d}")
        if os.path.isdir(d):
            shutil.rmtree(d)
    os.makedirs(os.path.join(ck, "state_00001"), exist_ok=True)

    res = minimum_spanning_forest(spark, wdf(spark, triples),
                                  num_partitions=4, checkpoint_dir=ck,
                                  resume=True)
    assert res.resumed_from == 0
    got = sorted(tuple(r) for r in forest_edges(res).collect())
    assert got == want
    # lineage metadata present on every completed superstep
    meta = json.load(open(os.path.join(ck, "state_00000", "_meta.json")))
    assert "partition_counts" in meta and meta["iteration"] == 0
