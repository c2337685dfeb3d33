"""SALSA vs a brute python power iteration, plus the Lempel-Moran
closed form: stationary authority mass ∝ in-degree within each
connected component of the co-citation graph."""

import random

from l_space_spark.operators.salsa import salsa

from conftest import edges_df


def brute_salsa(pairs, iters):
    links = {(s, d) for s, d in pairs if s != d}
    ind, outd = {}, {}
    for s, d in links:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
    auth = {j: 1.0 / len(ind) for j in ind}
    hub = {i: 1.0 / len(outd) for i in outd}
    for _ in range(iters):
        m = {}
        for s, d in links:
            m[s] = m.get(s, 0.0) + auth[d] / ind[d]
        a2 = {}
        for s, d in links:
            a2[d] = a2.get(d, 0.0) + m[s] / outd[s]
        t = sum(a2.values())
        auth = {j: a2.get(j, 0.0) / t for j in ind}
        hm = {}
        for s, d in links:
            hm[d] = hm.get(d, 0.0) + hub[s] / outd[s]
        h2 = {}
        for s, d in links:
            h2[s] = h2.get(s, 0.0) + hm[d] / ind[d]
        t = sum(h2.values())
        hub = {i: h2.get(i, 0.0) / t for i in outd}
    return hub, auth


def _run(spark, pairs, iters):
    res = salsa(spark, edges_df(spark, pairs), tol=-1.0, max_iters=iters,
                resume=False)
    rows = res.state.collect()
    return ({r["id"]: r["hub"] for r in rows},
            {r["id"]: r["auth"] for r in rows})


def test_matches_brute_power_iteration(spark):
    rng = random.Random(8)
    pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(60)]
    hub, auth = _run(spark, pairs, 6)
    bhub, bauth = brute_salsa(pairs, 6)
    for i, v in bhub.items():
        assert abs(hub[i] - v) < 1e-9
    for j, v in bauth.items():
        assert abs(auth[j] - v) < 1e-9
    # sides are disjointly supported: no in-links → auth 0, etc.
    for i in hub:
        if i not in bhub:
            assert hub[i] == 0.0
        if i not in bauth:
            assert auth[i] == 0.0


def test_stationary_auth_proportional_to_indegree(spark):
    # bipartite: hubs 0,1,2 → authorities 10,11,12; the co-citation
    # graph on {10,11,12} is connected, so the authority walk's limit
    # is in(j)/Σin — Lempel & Moran's theorem
    pairs = [(0, 10), (0, 11), (1, 10), (1, 11), (1, 12), (2, 10)]
    _, auth = _run(spark, pairs, 50)
    ind = {10: 3, 11: 2, 12: 1}
    for j, d in ind.items():
        assert abs(auth[j] - d / 6) < 1e-9


def test_mass_conservation_each_side(spark):
    rng = random.Random(13)
    pairs = [(rng.randrange(15), rng.randrange(15)) for _ in range(40)]
    hub, auth = _run(spark, pairs, 4)
    assert abs(sum(hub.values()) - 1.0) < 1e-9
    assert abs(sum(auth.values()) - 1.0) < 1e-9


def test_jobspec_salsa(spark, tmp_path):
    from l_space_spark.jobspec import run_job

    path = str(tmp_path / "edges")
    pairs = [(0, 10), (0, 11), (1, 10), (1, 11), (1, 12), (2, 10)]
    edges_df(spark, pairs).write.parquet(path)
    out = run_job(spark, {
        "kind": "algorithm", "algorithm": "salsa",
        "input": {"edges_parquet": path},
        "params": {"tol": -1.0, "max_iters": 50}, "top_k": 3,
    })
    rows = out.collect()
    assert [r["id"] for r in rows] == [10, 11, 12]
    assert abs(rows[0]["auth"] - 0.5) < 1e-9


def test_resume_flag_honored(spark, tmp_path):
    pairs = [(0, 10), (0, 11), (1, 10)]
    ck = str(tmp_path / "salsa")
    r1 = salsa(spark, edges_df(spark, pairs), tol=-1.0, max_iters=3,
               checkpoint_dir=ck, resume=True)
    assert r1.resumed_from is None
    r2 = salsa(spark, edges_df(spark, pairs), tol=-1.0, max_iters=3,
               checkpoint_dir=ck, resume=True)
    assert r2.resumed_from is not None
    r3 = salsa(spark, edges_df(spark, pairs), tol=-1.0, max_iters=3,
               checkpoint_dir=ck, resume=False)
    assert r3.resumed_from is None
