"""ANF neighborhood function vs an exact python ball/KMV simulator."""

import hashlib
import math
import random

from l_space_spark.operators.anf import neighborhood_function

from conftest import edges_df

DOMAIN = float(1 << 60)


def h60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def simulate(pairs, max_t, k):
    adj = {}
    verts = set()
    for s, d in set(pairs):
        adj.setdefault(s, set()).add(d)
        verts.update((s, d))
    balls = {v: {v} for v in verts}
    totals = [len(verts) * 1000]
    for _ in range(max_t):
        balls = {
            v: balls[v] | set().union(
                set(), *(balls[w] for w in adj.get(v, ()))
            )
            for v in verts
        }
        tot = 0
        for v in verts:
            hs = sorted(h60(u) for u in balls[v])[:k]
            est = (
                float(len(hs)) if len(hs) < k
                else float(k - 1) * DOMAIN / float(hs[k - 1])
            )
            tot += math.floor(est * 1000.0 + 0.5)
        totals.append(tot)
    return totals


def _run(spark, pairs, max_t, k):
    totals, res = neighborhood_function(
        spark, edges_df(spark, pairs), max_t=max_t, k=k, shards=4,
        num_partitions=4, resume=False,
    )
    got = {r["t"]: r["total_e3"] for r in totals.collect()}
    return [got[t] for t in range(max_t + 1)], res


def test_path_graph_exact_small_balls(spark):
    # balls stay < k => every estimate is exact
    pairs = [(i, i + 1) for i in range(6)]
    got, _ = _run(spark, pairs, max_t=3, k=16)
    # N(t) for a directed path of 7 vertices: sum over v of min(t+1, 7-v)
    want = [7000, 13000, 18000, 22000]
    assert got == want
    assert got == simulate(pairs, 3, 16)


def test_random_graph_matches_simulator_saturated(spark):
    rng = random.Random(11)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(70)]
    got, _ = _run(spark, pairs, max_t=3, k=4)  # tiny k => estimator branch
    assert got == simulate(pairs, 3, 4)


def test_sketches_monotone_and_reusable(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 4)]
    got, res = _run(spark, pairs, max_t=4, k=8)
    assert got == simulate(pairs, 4, 8)
    assert all(a <= b for a, b in zip(got, got[1:]))  # N(t) is monotone
    # final state: one sorted bottom-k sketch per vertex
    rows = res.state.collect()
    assert len(rows) == 5
    for r in rows:
        assert r["sk"] == sorted(r["sk"]) and len(r["sk"]) <= 8


def test_resumed_run_reports_only_executed_rounds(spark, tmp_path):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    ck = str(tmp_path / "anf_ck")
    t1, r1 = neighborhood_function(
        spark, edges_df(spark, pairs), max_t=3, k=8, shards=4,
        num_partitions=4, checkpoint_dir=ck,
    )
    assert r1.resumed_from is None and t1.count() == 4
    # resuming a COMPLETED run executes no rounds: totals must be empty
    # (not mislabeled), and the final sketch state must be unchanged
    t2, r2 = neighborhood_function(
        spark, edges_df(spark, pairs), max_t=3, k=8, shards=4,
        num_partitions=4, checkpoint_dir=ck,
    )
    assert r2.resumed_from is not None
    assert t2.count() == 0
    s1 = {(r["id"], tuple(r["sk"])) for r in r1.state.collect()}
    s2 = {(r["id"], tuple(r["sk"])) for r in r2.state.collect()}
    assert s1 == s2


def test_distance_stats_known_curve():
    from l_space_spark.operators.anf import distance_stats

    # path-graph curve from test_path_graph_exact_small_balls:
    # N = [7000, 13000, 18000, 22000]; avg over non-self pairs =
    # (1*6000 + 2*5000 + 3*4000)/15000 = 28/15
    rows = [{"t": t, "total_e3": n}
            for t, n in enumerate([7000, 13000, 18000, 22000])]
    st = distance_stats(rows)
    assert st["avg_dist_e6"] == round(28 / 15 * 1e6)
    # 0.9 * 22000 = 19800 crossed between t=2 (18000) and t=3 (22000):
    # 2 + (19800-18000)/4000 = 2.45
    assert st["eff_diam_e6"] == 2_450_000
    # degenerate: no growth
    assert distance_stats([{"t": 0, "total_e3": 5000}]) == {
        "avg_dist_e6": -1, "eff_diam_e6": -1}
