"""PPR sweep cut: hand barbell (the community the sweep must find) and
structural invariants on random graphs — cut/volume recomputed brute
from the returned order, so PPR itself needn't be twinned."""

import random
from collections import defaultdict

from pyspark.sql import functions as F

from l_space_spark.operators.sweepcut import best_sweep_cut, ppr_sweep_cut

from conftest import edges_df


def _seeds(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "id long")


def test_barbell_finds_the_seeded_triangle(spark):
    # two triangles joined by one edge; seeds in the left triangle
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)]
    curve = ppr_sweep_cut(spark, edges_df(spark, pairs),
                          _seeds(spark, [1, 2]), iters=8, k=6,
                          num_partitions=4)
    rows = curve.collect()
    assert [r["pos"] for r in rows] == [1, 2, 3, 4, 5, 6]
    assert {r["id"] for r in rows[:3]} == {1, 2, 3}
    r3 = rows[2]
    # prefix {1,2,3}: cut = the bridge (3,4), volume = 2+2+3 = 7 of 14
    assert (r3["cut_edges"], r3["volume"]) == (1, 7)
    assert r3["phi_e6"] == (2000000 * 1 + 7) // (2 * 7)
    best = best_sweep_cut(curve).collect()[0]
    assert best["pos"] == 3 and best["phi_e6"] == r3["phi_e6"]


def test_curve_invariants_match_brute_force(spark):
    rng = random.Random(23)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    curve = ppr_sweep_cut(spark, edges_df(spark, pairs),
                          _seeds(spark, [0]), iters=6, k=12,
                          num_partitions=4).collect()
    order = [r["id"] for r in curve]
    total_vol = sum(len(v) for v in adj.values())
    canon = {(min(a, b), max(a, b)) for a in adj for b in adj[a]}
    for i, r in enumerate(curve):
        prefix = set(order[: i + 1])
        cut = sum(1 for a, b in canon if (a in prefix) != (b in prefix))
        vol = sum(len(adj[v]) for v in prefix)
        assert (r["cut_edges"], r["volume"]) == (cut, vol), f"pos {r['pos']}"
        m = min(vol, total_vol - vol)
        want_phi = (2000000 * cut + m) // (2 * m) if m > 0 else None
        assert r["phi_e6"] == want_phi
    # order is degree-normalized-score descending with id tie-break
    keys = [(-r["score_key"], r["id"]) for r in curve]
    assert keys == sorted(keys)


def test_k_caps_the_sweep(spark):
    pairs = [(i, i + 1) for i in range(20)]
    curve = ppr_sweep_cut(spark, edges_df(spark, pairs),
                          _seeds(spark, [10]), iters=5, k=5,
                          num_partitions=4)
    assert curve.count() == 5
