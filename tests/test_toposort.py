"""DAG longest-path levels (operators/toposort.py) vs python twins."""

import random
from collections import defaultdict

from l_space_spark.operators.toposort import dag_levels

from conftest import edges_df


def brute_levels(pairs, extra_vertices=()):
    """Exact longest-path level by iterating the same recurrence to a
    fixpoint (guaranteed on a DAG)."""
    preds = defaultdict(set)
    verts = set(extra_vertices)
    for s, d in pairs:
        verts.add(s)
        verts.add(d)
        if s != d:
            preds[d].add(s)
    lev = {v: 0 for v in verts}
    for _ in range(len(verts) + 1):
        new = {v: max((lev[u] + 1 for u in preds[v]), default=0)
               for v in verts}
        if new == lev:
            return lev
        lev = new
    raise AssertionError("not a DAG")


def _run(spark, pairs, **kw):
    res = dag_levels(spark, edges_df(spark, pairs), resume=False, **kw)
    return res, {r["id"]: r["level"] for r in res.state.collect()}


def test_chain_and_source_levels(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (0, 3)]
    res, got = _run(spark, pairs)
    # longest path wins: 3 sits at level 3 (0-1-2-3), not 1 (0-3)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    assert res.converged


def test_random_dag_matches_brute(spark):
    rng = random.Random(13)
    pairs = []
    for _ in range(80):
        a, b = rng.randrange(30), rng.randrange(30)
        if a != b:
            pairs.append((min(a, b), max(a, b)))  # u<v ⇒ acyclic
    _, got = _run(spark, pairs)
    assert got == brute_levels(pairs)


def test_isolated_vertices_via_universe(spark):
    pairs = [(0, 1)]
    verts = edges_df(spark, [(7, 7), (8, 8)]).selectExpr("src AS id")
    _, got = _run(spark, pairs, vertices=verts)
    # universe override REPLACES the edge-endpoint default
    assert got == {7: 0, 8: 0}


def test_cycle_exhausts_budget_without_converging(spark):
    res, got = _run(spark, [(0, 1), (1, 0)], max_iters=5)
    assert not res.converged
    assert res.iterations == 5


def test_fixed_iters_noop_past_convergence(spark):
    pairs = [(0, 1), (1, 2)]
    _, exact = _run(spark, pairs)
    _, fixed = _run(spark, pairs, max_iters=9, fixed_iters=True,
                    materialize_every=3)
    assert fixed == exact


def test_resume_from_checkpoint(spark, tmp_path):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    ck = str(tmp_path / "topo")
    full = dag_levels(spark, edges_df(spark, pairs), checkpoint_dir=ck,
                      resume=False)
    assert full.converged
    again = dag_levels(spark, edges_df(spark, pairs), checkpoint_dir=ck,
                       resume=True)
    assert again.resumed_from is not None
    assert ({r["id"]: r["level"] for r in again.state.collect()}
            == {r["id"]: r["level"] for r in full.state.collect()})
