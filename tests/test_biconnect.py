"""Biconnected components + articulation points vs the textbook Tarjan
DFS twin: block partitions compared as sets-of-edge-sets (labels are
representation-dependent), articulation points compared exactly."""

import random
from collections import defaultdict

from l_space_spark.operators.biconnect import (
    articulation_points,
    biconnected_components,
)

from conftest import edges_df


def _adj(pairs):
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return adj


def tarjan_blocks_and_aps(pairs):
    """Iterative Tarjan: returns (set of frozenset-of-edges blocks,
    set of articulation points)."""
    adj = _adj(pairs)
    disc, low = {}, {}
    aps, blocks = set(), []
    stack = []  # edge stack
    timer = [0]

    for root in sorted(adj):
        if root in disc:
            continue
        # iterative DFS
        call = [(root, None, iter(sorted(adj[root])))]
        disc[root] = low[root] = timer[0]
        timer[0] += 1
        root_children = 0
        while call:
            v, parent, it = call[-1]
            advanced = False
            for w in it:
                if w == parent:
                    # skip ONE parent edge occurrence only (simple graph)
                    parent = None
                    continue
                if w not in disc:
                    stack.append((min(v, w), max(v, w)))
                    disc[w] = low[w] = timer[0]
                    timer[0] += 1
                    if v == root:
                        root_children += 1
                    call.append((w, v, iter(sorted(adj[w]))))
                    advanced = True
                    break
                elif disc[w] < disc[v]:
                    stack.append((min(v, w), max(v, w)))
                    low[v] = min(low[v], disc[w])
            if advanced:
                continue
            call.pop()
            if call:
                u = call[-1][0]
                low[u] = min(low[u], low[v])
                if low[v] >= disc[u]:
                    if u != root or root_children >= 0:
                        blk = set()
                        while stack and stack[-1] != (min(u, v), max(u, v)):
                            blk.add(stack.pop())
                        if stack:
                            blk.add(stack.pop())
                        if blk:
                            blocks.append(frozenset(blk))
                    if u != root:
                        aps.add(u)
        if root_children >= 2:
            aps.add(root)
    return set(blocks), aps


def _spark_blocks(spark, pairs):
    rows = biconnected_components(spark, edges_df(spark, pairs),
                                  num_partitions=4).collect()
    by_label = defaultdict(set)
    for r in rows:
        by_label[r["block"]].add((r["a"], r["b"]))
    return set(frozenset(s) for s in by_label.values())


def _spark_aps(spark, pairs):
    return {r["id"] for r in
            articulation_points(spark, edges_df(spark, pairs),
                                num_partitions=4).collect()}


def test_path_every_inner_vertex_cuts(spark):
    pairs = [(i, i + 1) for i in range(6)]
    assert _spark_aps(spark, pairs) == {1, 2, 3, 4, 5}
    # every edge its own block
    want, _ = tarjan_blocks_and_aps(pairs)
    assert _spark_blocks(spark, pairs) == want


def test_cycle_no_cuts_one_block(spark):
    pairs = [(i, (i + 1) % 6) for i in range(6)]
    assert _spark_aps(spark, pairs) == set()
    assert _spark_blocks(spark, pairs) == {
        frozenset({(min(i, (i + 1) % 6), max(i, (i + 1) % 6))
                   for i in range(6)})
    }


def test_two_triangles_sharing_a_vertex(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)]
    assert _spark_aps(spark, pairs) == {3}
    assert _spark_blocks(spark, pairs) == {
        frozenset({(1, 2), (2, 3), (1, 3)}),
        frozenset({(3, 4), (4, 5), (3, 5)}),
    }


def test_barbell_bridge_is_own_block(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)]
    want_blocks, want_aps = tarjan_blocks_and_aps(pairs)
    assert _spark_aps(spark, pairs) == want_aps == {3, 4}
    assert _spark_blocks(spark, pairs) == want_blocks
    assert frozenset({(3, 4)}) in want_blocks  # the bridge block


def test_random_graphs_match_tarjan(spark):
    for seed, n, m in ((5, 18, 22), (6, 25, 30), (7, 30, 45)):
        rng = random.Random(seed)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        want_blocks, want_aps = tarjan_blocks_and_aps(pairs)
        assert _spark_aps(spark, pairs) == want_aps, f"seed {seed} aps"
        assert _spark_blocks(spark, pairs) == want_blocks, f"seed {seed}"


def test_canonical_relabel_matches_tarjan(spark):
    """biconnected_components_canonical names every block by its
    lexicographically-minimal edge — representation-independent, so it
    must equal the Tarjan twin's partition with the same naming rule."""
    from l_space_spark.operators.biconnect import (
        biconnected_components_canonical,
    )

    rng = random.Random(11)
    pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(28)]
    want_blocks, _ = tarjan_blocks_and_aps(pairs)
    want = {(a, b): min(blk) for blk in want_blocks
            for (a, b) in blk}
    rows = biconnected_components_canonical(
        spark, edges_df(spark, pairs), num_partitions=4).collect()
    got = {(r["a"], r["b"]): (r["block_a"], r["block_b"]) for r in rows}
    assert got == want
    # at least one non-singleton block, or the relabel wasn't exercised
    assert len({v for v in got.values()}) < len(got)


def test_jobspec_kinds(spark, tmp_path):
    from l_space_spark.jobspec import run_job

    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)]
    p = str(tmp_path / "bic")
    edges_df(spark, pairs).write.parquet(p)
    out = run_job(spark, {"kind": "algorithm",
                          "algorithm": "articulation_points",
                          "input": {"edges_parquet": p}, "params": {}})
    assert [r["id"] for r in out.collect()] == [3]
    out2 = run_job(spark, {"kind": "algorithm",
                           "algorithm": "biconnected_components",
                           "input": {"edges_parquet": p}, "params": {}})
    by_label = defaultdict(set)
    for r in out2.collect():
        by_label[r["block"]].add((r["a"], r["b"]))
    assert set(map(frozenset, by_label.values())) == {
        frozenset({(1, 2), (2, 3), (1, 3)}),
        frozenset({(3, 4), (4, 5), (3, 5)}),
    }
