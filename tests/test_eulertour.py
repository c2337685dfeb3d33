"""Euler tour + list ranking vs a recursive Python twin: parent/
first/last intervals exactly, dense arc positions, prefix-xor subtree
folds, and sparse-table range min/max — including the deep-path shape
the old BFS orientation paid O(depth) rounds for."""

import functools
import operator
import random
import sys

from pyspark.sql import functions as F

from l_space_spark.operators.components import connected_components_star
from l_space_spark.operators.eulertour import (
    NEUTRAL_HI,
    NEUTRAL_LO,
    euler_tour,
    range_minmax_query,
    tour_prefix_xor,
    tour_range_minmax,
)


def py_tour(tree_pairs):
    """Reference: parent/first/last per vertex via a recursive Euler
    walk rooted at each component's min vertex, neighbors in sorted
    order, global positions concatenated in component order."""
    from collections import defaultdict

    adj = defaultdict(set)
    verts = set()
    for u, v in tree_pairs:
        adj[u].add(v)
        adj[v].add(u)
        verts |= {u, v}
    seen, comps = set(), []
    for v in sorted(verts):
        if v in seen:
            continue
        stack, comp = [v], set()
        seen.add(v)
        while stack:
            x = stack.pop()
            comp.add(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        comps.append((min(comp), comp))
    comps.sort()
    out = {}
    off = 0
    sys.setrecursionlimit(100000)
    for root, comp in comps:
        pos = [off]
        first, last, parent = {}, {}, {root: None}

        def walk(u, p):
            for w in sorted(adj[u]):
                if w == p:
                    continue
                parent[w] = u
                first[w] = pos[0]
                pos[0] += 1
                walk(w, u)
                last[w] = pos[0]
                pos[0] += 1

        walk(root, None)
        seglen = 2 * (len(comp) - 1)
        first[root] = off - 1
        last[root] = off + seglen - 1
        for x in comp:
            out[x] = (parent[x], first[x], last[x])
        off += seglen
    return out


def _tour(spark, tree_pairs):
    tdf = spark.createDataFrame(tree_pairs, "u long, v long")
    edges = tdf.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    cc = connected_components_star(spark, edges, num_partitions=4,
                                   resume=False).state
    return euler_tour(spark, tdf, cc, 4)


def _check(spark, tree_pairs):
    et = _tour(spark, tree_pairs)
    got = {r["id"]: (r["parent"], r["first"], r["last"])
           for r in et.intervals.collect()}
    want = py_tour(tree_pairs)
    assert got == want
    pos = sorted(r["gpos"] for r in et.arcs.collect())
    assert pos == list(range(et.total))
    return et, want


def test_path_star_forest(spark):
    _check(spark, [(i, i + 1) for i in range(9)])
    # negative vertex ids: roots are NULL-parent, not a -1 sentinel —
    # a graph containing vertex -1 (or any negative id) must still work
    _check(spark, [(i, i + 1) for i in range(-5, 4)])
    _check(spark, [(0, i) for i in range(1, 8)])
    rng = random.Random(5)
    pairs = []
    for base in (0, 100):
        n = rng.randrange(5, 30)
        for i in range(1, n):
            pairs.append((base + rng.randrange(i), base + i))
    _check(spark, pairs)


def test_deep_path_logarithmic_rounds(spark):
    """A 300-vertex path ranks within the 64-round doubling cap — the
    shape where per-level BFS orientation needed 300 rounds."""
    et, want = _check(spark, [(i, i + 1) for i in range(299)])
    assert et.total == 598


def test_folds_match_bruteforce(spark):
    n = 40
    rng = random.Random(9)
    pairs = [(rng.randrange(i), i) for i in range(1, n)]
    et, want = _check(spark, pairs)
    vals = {v: (v * v + 1) for v in want if want[v][0] is not None}

    placed = et.arcs.select("gpos").join(
        et.arcs.sparkSession.createDataFrame(
            [(want[v][1], vals[v]) for v in vals], "gpos long, val long"),
        "gpos", "left").select(
            "gpos", F.coalesce("val", F.lit(0)).alias("val"))
    px = {r["gpos"]: (r["pxi"], r["pxe"])
          for r in tour_prefix_xor(placed).collect()}

    placed2 = et.arcs.select("gpos").join(
        spark.createDataFrame(
            [(want[v][1], vals[v], vals[v]) for v in vals],
            "gpos long, lo long, hi long"),
        "gpos", "left").select(
            "gpos", F.coalesce("lo", F.lit(NEUTRAL_LO)).alias("lo"),
            F.coalesce("hi", F.lit(NEUTRAL_HI)).alias("hi"))
    tall, _ = tour_range_minmax(placed2, et.total)
    qs = spark.createDataFrame(
        [(c, want[c][1], want[c][2]) for c in want
         if want[c][0] is not None],
        "c long, qfirst long, qlast long")
    rmq = {r["c"]: (r["range_lo"], r["range_hi"])
           for r in range_minmax_query(qs, tall).collect()}

    for c in want:
        p, f, l = want[c]
        if p is None:
            continue
        sub = [vals[v] for v in vals if f <= want[v][1] <= l]
        expect_xor = functools.reduce(operator.xor, sub, 0)
        assert px[l][0] ^ px[f][1] == expect_xor
        emin = min(sub) if sub else NEUTRAL_LO
        emax = max(sub) if sub else NEUTRAL_HI
        assert rmq[c] == (emin, emax)


def test_tree_depths(spark):
    from l_space_spark.operators.eulertour import tree_depths

    rng = random.Random(13)
    pairs = [(rng.randrange(i), i) for i in range(1, 35)]
    pairs += [(100, 101), (101, 102), (102, 103)]  # second component
    et, want = _check(spark, pairs)
    got = {r["id"]: (r["parent"], r["depth"], r["subtree_size"])
           for r in tree_depths(et).collect()}

    def depth_of(v):
        d = 0
        while want[v][0] is not None:
            v = want[v][0]
            d += 1
        return d

    def size_of(v):
        # roots' virtual firsts (segstart-1) are not real placements —
        # count only non-root entries in the interval, +1 for the root
        f, l = want[v][1], want[v][2]
        n = sum(1 for x in want
                if want[x][0] is not None and f <= want[x][1] <= l)
        return n + (1 if want[v][0] is None else 0)

    assert got == {v: (want[v][0], depth_of(v), size_of(v))
                   for v in want}


def test_lca_pairs(spark):
    from itertools import combinations

    from l_space_spark.operators.eulertour import lca_pairs

    rng = random.Random(21)
    pairs = [(rng.randrange(i), i) for i in range(1, 30)]
    pairs += [(200, 201), (201, 202), (200, 203)]  # second component
    et, want = _check(spark, pairs)

    def ancestors(v):
        out = [v]
        while want[v][0] is not None:
            v = want[v][0]
            out.append(v)
        return out

    comp = {v: ancestors(v)[-1] for v in want}
    qp = [(a, b) for a, b in combinations(sorted(want), 2)
          if comp[a] == comp[b]]
    expect = {}
    for a, b in qp:
        aa = ancestors(a)
        bb = set(ancestors(b))
        expect[(a, b)] = next(x for x in aa if x in bb)

    qdf = spark.createDataFrame(qp, "u long, v long")
    got = {(r["u"], r["v"]): (r["lca"], r["tree_dist"])
           for r in lca_pairs(et, qdf).collect()}
    expect2 = {}
    for (a, b), l in expect.items():
        da, db, dl = (len(ancestors(a)), len(ancestors(b)),
                      len(ancestors(l)))
        expect2[(a, b)] = (l, da + db - 2 * dl)
    assert got == expect2


def test_path_max_pairs(spark):
    from itertools import combinations

    from l_space_spark.operators.eulertour import path_max_pairs

    rng = random.Random(31)
    pairs = [(rng.randrange(i), i) for i in range(1, 28)]
    pairs += [(300, 301), (301, 302)]
    wmap = {(min(a, b), max(a, b)): rng.randrange(1, 10 ** 9)
            for a, b in pairs}
    et, want = _check(spark, pairs)

    def chain(v):
        out = [v]
        while want[v][0] is not None:
            v = want[v][0]
            out.append(v)
        return out

    comp = {v: chain(v)[-1] for v in want}
    qp = [(a, b) for a, b in combinations(sorted(want), 2)
          if comp[a] == comp[b]]
    expect = {}
    for a, b in qp:
        ca, cb = chain(a), set(chain(b))
        lca = next(x for x in ca if x in cb)
        mx = 0
        for side in (a, b):
            v = side
            while v != lca:
                p = want[v][0]
                mx = max(mx, wmap[(min(v, p), max(v, p))])
                v = p
        expect[(a, b)] = mx

    wtree = spark.createDataFrame(
        [(u, v, wmap[(min(u, v), max(u, v))]) for u, v in pairs],
        "u long, v long, w long")
    qdf = spark.createDataFrame(qp, "u long, v long")
    got = {(r["u"], r["v"]): r["path_max"]
           for r in path_max_pairs(et, wtree, qdf).collect()}
    assert got == expect


def test_missing_cc_label_fails_loud(spark):
    """A cc labeling that misses a vertex must raise, not silently
    mis-rank (round-4 ADVICE: the old inner join dropped the missing
    vertex's arcs and the post-loop ns-null check still passed)."""
    import pytest

    tdf = spark.createDataFrame([(0, 1), (1, 2)], "u long, v long")
    cc = spark.createDataFrame([(0, 0), (1, 0)], "id long, component long")
    with pytest.raises(RuntimeError, match="no cc label"):
        euler_tour(spark, tdf, cc, 4)


def test_singleton_roots_distinct_intervals(spark):
    """Arc-less roots (singleton components) must carry DISTINCT
    degenerate intervals: with the old shared [-1, -1] two singletons
    mutually passed the ancestor-containment test. Mixed case: one real
    tree + two singletons (one with a negative id)."""
    tdf = spark.createDataFrame([(10, 11)], "u long, v long")
    cc = spark.createDataFrame(
        [(10, 10), (11, 10), (5, 5), (-7, -7)], "id long, component long")
    et = euler_tour(spark, tdf, cc, 4)
    iv = {r["id"]: (r["first"], r["last"]) for r in et.intervals.collect()}
    # tree root keeps the virtual [-1, last] interval; arc positions 0..1
    assert iv[10] == (-1, 1) and iv[11] == (0, 1)
    f5, l5 = iv[5]
    f7, l7 = iv[-7]
    assert f5 == l5 and f7 == l7          # point intervals
    assert f5 < -1 and f7 < -1            # outside real/virtual positions
    assert (f5, l5) != (f7, l7)           # unique per root
    # neither contains the other, each contains itself
    assert not (f5 <= f7 and l7 <= l5)
    assert not (f7 <= f5 and l5 <= l7)


def test_all_singletons_total_zero(spark):
    """The total==0 branch gives every singleton root its own sentinel
    interval too."""
    tdf = spark.createDataFrame([], "u long, v long")
    cc = spark.createDataFrame(
        [(3, 3), (4, 4)], "id long, component long")
    et = euler_tour(spark, tdf, cc, 4)
    iv = {r["id"]: (r["first"], r["last"]) for r in et.intervals.collect()}
    assert et.total == 0 and len(iv) == 2
    (f3, l3), (f4, l4) = iv[3], iv[4]
    assert f3 == l3 and f4 == l4 and f3 != f4 and f3 < -1 and f4 < -1
