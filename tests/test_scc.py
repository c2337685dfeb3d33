"""Strongly connected components vs a pure-python Kosaraju oracle.

Exact match required: ``scc`` = min vertex id of the component,
singletons included (every vertex off any directed cycle).
"""

import random

from l_space_spark.operators.scc import strongly_connected_components

from conftest import edges_df


def kosaraju(pairs):
    """dict id -> min id of its SCC (iterative two-pass Kosaraju)."""
    fwd, rev, verts = {}, {}, set()
    for s, d in pairs:
        if s == d:
            verts.add(s)
            continue
        fwd.setdefault(s, []).append(d)
        rev.setdefault(d, []).append(s)
        verts.update((s, d))

    order, seen = [], set()
    for v0 in verts:
        if v0 in seen:
            continue
        stack = [(v0, iter(fwd.get(v0, ())))]
        seen.add(v0)
        while stack:
            v, it = stack[-1]
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(fwd.get(w, ()))))
                    break
            else:
                order.append(v)
                stack.pop()

    out, assigned = {}, set()
    for v0 in reversed(order):
        if v0 in assigned:
            continue
        comp, stack = [], [v0]
        assigned.add(v0)
        while stack:
            v = stack.pop()
            comp.append(v)
            for w in rev.get(v, ()):
                if w not in assigned:
                    assigned.add(w)
                    stack.append(w)
        root = min(comp)
        for v in comp:
            out[v] = root
    return out


def _run(spark, pairs, **kw):
    res = strongly_connected_components(
        spark, edges_df(spark, pairs), num_partitions=4, **kw
    )
    return {r["id"]: r["scc"] for r in res.state.collect()}, res


def test_cycle_is_one_scc(spark):
    pairs = [(i, (i + 1) % 6) for i in range(6)]
    got, res = _run(spark, pairs)
    assert res.converged
    assert got == {i: 0 for i in range(6)}


def test_dag_all_singletons_one_round(spark):
    # pure DAG chain: trim-to-fixpoint dissolves it in ONE outer round
    pairs = [(i, i + 1) for i in range(8)]
    got, res = _run(spark, pairs)
    assert got == {i: i for i in range(9)}
    assert res.iterations <= 2  # round 1 peels all, round 2 sees 0 active

def test_two_cycles_bridged(spark):
    # 0->1->2->0 and 10->11->10, bridge 2->10 (one direction only)
    pairs = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 10), (2, 10)]
    got, _ = _run(spark, pairs)
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}


def test_figure_eight_shares_vertex(spark):
    # two cycles sharing vertex 0 => one SCC
    pairs = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0)]
    got, _ = _run(spark, pairs)
    assert set(got.values()) == {0}


def test_self_loops_and_isolated(spark):
    got, _ = _run(spark, [(5, 5), (5, 6)])
    assert got == {5: 5, 6: 6}


def test_self_loop_only_vertex_is_singleton(spark):
    # a vertex whose ONLY edges are self-loops must still appear
    got, _ = _run(spark, [(5, 5), (1, 2)])
    assert got == {1: 1, 2: 2, 5: 5}


def test_random_graphs_match_kosaraju(spark):
    for seed, n, m in [(1, 12, 18), (2, 20, 30), (3, 30, 75), (4, 9, 40)]:
        rng = random.Random(seed)
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        pairs = [(s, d) for s, d in pairs] or [(0, 1)]
        got, res = _run(spark, pairs)
        want = kosaraju(pairs)
        assert got == want, f"seed={seed}"
        assert res.converged


def test_scc_resume_from_checkpoint(spark, tmp_path):
    rng = random.Random(7)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(40)]
    ck = str(tmp_path / "scc_ck")
    full, _ = _run(spark, pairs)
    # fresh run against the same checkpoint dir resumes to the same answer
    _, r1 = _run(spark, pairs, checkpoint_dir=ck)
    got2, r2 = _run(spark, pairs, checkpoint_dir=ck)
    assert r2.resumed_from is not None
    assert got2 == full
