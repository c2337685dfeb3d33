"""Bipartite projection + degree assortativity vs python twins."""

import math
import random
from collections import defaultdict

from l_space_spark.operators.graphstats import (
    bipartite_project,
    degree_assortativity,
)

from conftest import edges_df


def test_projection_weights_and_hub_cap(spark):
    # customers 100..102; supplier pairs share customers
    pairs = [(100, 1), (100, 2), (100, 3), (101, 1), (101, 2), (102, 9)]
    got = {(r["u"], r["w"]): r["weight"] for r in
           bipartite_project(edges_df(spark, pairs)).collect()}
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    capped = {(r["u"], r["w"]): r["weight"] for r in
              bipartite_project(edges_df(spark, pairs),
                                max_hub_degree=2).collect()}
    assert capped == {(1, 2): 1}  # only hub 101 (degree 2) survives


def assort_twin(pairs):
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    xs, ys = [], []
    for a in adj:
        for b in adj[a]:
            xs.append(len(adj[a]))
            ys.append(len(adj[b]))
    n = float(len(xs))
    sx, sy = float(sum(xs)), float(sum(ys))
    sxy = float(sum(x * y for x, y in zip(xs, ys)))
    sxx, syy = float(sum(x * x for x in xs)), float(sum(y * y for y in ys))
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return None
    return math.floor(
        (n * sxy - sx * sy) / math.sqrt(vx * vy) * 1e6 + 0.5)


def test_assortativity_star_is_negative(spark):
    pairs = [(0, i) for i in range(1, 6)]
    r = degree_assortativity(edges_df(spark, pairs)).collect()[0]["r_e6"]
    assert r == assort_twin(pairs) == -1_000_000  # perfectly disassortative


def test_assortativity_regular_graph_degenerate(spark):
    pairs = [(i, (i + 1) % 6) for i in range(6)]  # 2-regular cycle
    r = degree_assortativity(edges_df(spark, pairs)).collect()[0]["r_e6"]
    assert r is None


def test_assortativity_random_matches_twin(spark):
    rng = random.Random(13)
    pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(45)]
    r = degree_assortativity(edges_df(spark, pairs)).collect()[0]["r_e6"]
    assert r == assort_twin(pairs)


# --- rectangle count ---------------------------------------------------------

from itertools import combinations  # noqa: E402

from l_space_spark.operators.graphstats import rectangle_count  # noqa: E402


def brute_rectangles(pairs):
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    total = 0
    for u, w in combinations(sorted(adj), 2):
        c = len(adj[u] & adj[w])
        total += c * (c - 1) // 2
    assert total % 2 == 0
    return total // 2


def _rect(spark, pairs, **kw):
    return rectangle_count(edges_df(spark, pairs), **kw).collect()[0][
        "rectangles"]


def test_single_square(spark):
    assert _rect(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]) == 1


def test_chorded_square_still_one_plus_none_new(spark):
    # a chord adds triangles, not rectangles: still exactly one C4
    assert _rect(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]) == 1


def test_k4_has_three_rectangles(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _rect(spark, k4) == 3 == brute_rectangles(k4)


def test_triangle_has_none(spark):
    assert _rect(spark, [(0, 1), (1, 2), (2, 0)]) == 0


def test_random_matches_brute(spark):
    rng = random.Random(11)
    pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(70)]
    assert _rect(spark, pairs) == brute_rectangles(pairs)


def induced_under_cap(pairs, cap):
    """Edge list of the subgraph induced on vertices with degree <= cap —
    the documented semantics of a capped rectangle_count run."""
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    ok = {v for v in adj if len(adj[v]) <= cap}
    return [(s, d) for s, d in pairs if s in ok and d in ok and s != d]


def test_hub_cap_is_induced_subgraph_count(spark):
    # celebrity 99 closes rectangles through itself; capped run counts
    # exactly the rectangles of the under-cap induced subgraph
    pairs = [(99, i) for i in range(6)] + [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert _rect(spark, pairs) == brute_rectangles(pairs)
    capped = _rect(spark, pairs, max_hub_degree=4)
    assert capped == brute_rectangles(induced_under_cap(pairs, 4))
    assert capped < _rect(spark, pairs)


def test_hub_cap_one_sided_diagonal_regression(spark):
    # square 0-1-2-3 with vertex 1 hub-inflated past the cap: only the
    # {0,2} diagonal's corner pair would survive a one-sided edge cap,
    # making the incidence sum odd (=1) and `div 2` silently return 0 in
    # a way that misread as "1 rectangle counted". Induced-subgraph
    # semantics drop vertex 1 entirely: exactly 0 rectangles, and the
    # count equals the brute force of the induced subgraph.
    pairs = ([(0, 1), (1, 2), (2, 3), (3, 0)]
             + [(1, k) for k in range(10, 14)])
    capped = _rect(spark, pairs, max_hub_degree=3)
    assert capped == brute_rectangles(induced_under_cap(pairs, 3)) == 0


def test_hub_cap_random_matches_induced_brute(spark):
    rng = random.Random(29)
    pairs = [(rng.randrange(15), rng.randrange(15)) for _ in range(60)]
    for cap in (3, 5, 8):
        assert _rect(spark, pairs, max_hub_degree=cap) == brute_rectangles(
            induced_under_cap(pairs, cap)
        )


# ---- rich club / local bridges / embeddedness ----

def rich_club_twin(pairs, ks):
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    out = {}
    for k in ks:
        vs = {v for v in adj if len(adj[v]) > k}
        n = len(vs)
        e = sum(1 for a in vs for b in adj[a] if b in vs and a < b)
        phi = (2_000_000 * e) // (n * (n - 1)) if n >= 2 else None
        out[k] = (n, e, phi)
    return out


def test_rich_club_star_plus_clique(spark):
    # K4 on 0-3 plus leaves 10..14 hung off vertex 0
    pairs = ([(a, b) for a in range(4) for b in range(a + 1, 4)]
             + [(0, i) for i in range(10, 15)])
    from l_space_spark.operators.graphstats import rich_club
    got = {r["k"]: (r["n_gt"], r["e_gt"], r["phi_e6"]) for r in
           rich_club(edges_df(spark, pairs), ks=(1, 2, 3, 8)).collect()}
    assert got == rich_club_twin(pairs, (1, 2, 3, 8))
    # k=2: the K4 vertices (deg 3,3,3,8) form a complete rich club
    assert got[2] == (4, 6, 1_000_000)
    # k=8: vertex 0 has degree exactly 8, so STRICT > leaves nobody
    assert got[8] == (0, 0, None)
    # k=3: only vertex 0 (degree 8) qualifies -> degenerate NULL
    assert got[3] == (1, 0, None)


def test_rich_club_random_matches_twin(spark):
    rnd = random.Random(7)
    pairs = [(rnd.randrange(30), rnd.randrange(30)) for _ in range(120)]
    ks = (1, 2, 4, 8)
    from l_space_spark.operators.graphstats import rich_club
    got = {r["k"]: (r["n_gt"], r["e_gt"], r["phi_e6"]) for r in
           rich_club(edges_df(spark, pairs), ks=ks).collect()}
    assert got == rich_club_twin(pairs, ks)


def bridges_twin(pairs):
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return {(a, b) for a in adj for b in adj[a]
            if a < b and not (adj[a] & adj[b])}


def test_local_bridges_barbell(spark):
    # two triangles joined by one bridge edge (3, 10)
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3),
             (10, 11), (11, 12), (12, 10), (3, 10)]
    from l_space_spark.operators.graphstats import local_bridges
    got = {(r["a"], r["b"]) for r in
           local_bridges(edges_df(spark, pairs)).collect()}
    assert got == bridges_twin(pairs) == {(2, 3), (3, 10)}


def test_local_bridges_and_embeddedness_random(spark):
    rnd = random.Random(11)
    pairs = [(rnd.randrange(25), rnd.randrange(25)) for _ in range(70)]
    from l_space_spark.operators.graphstats import (
        embeddedness_distribution, local_bridges)
    got = {(r["a"], r["b"]) for r in
           local_bridges(edges_df(spark, pairs)).collect()}
    want = bridges_twin(pairs)
    assert got == want
    # histogram: support-0 bucket == bridge count; totals == |E|
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    hist = defaultdict(int)
    for a in adj:
        for b in adj[a]:
            if a < b:
                hist[len(adj[a] & adj[b])] += 1
    dist = {r["support"]: r["n_edges"] for r in
            embeddedness_distribution(edges_df(spark, pairs)).collect()}
    assert dist == dict(hist)
    assert dist.get(0, 0) == len(want)


from l_space_spark.operators.graphstats import k4_count  # noqa: E402


def k4_brute(pairs):
    adj = defaultdict(set)
    verts = set()
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
            verts.update((s, d))
    n = 0
    for quad in combinations(sorted(verts), 4):
        if all(b in adj[a] for a, b in combinations(quad, 2)):
            n += 1
    return n


def test_k4_single_clique(spark):
    pairs = list(combinations(range(4), 2))
    assert k4_count(edges_df(spark, pairs)).collect()[0]["k4"] == 1


def test_k4_k5_has_five(spark):
    pairs = list(combinations(range(5), 2))
    assert k4_count(edges_df(spark, pairs)).collect()[0]["k4"] == 5


def test_k4_chorded_square_zero(spark):
    # C4 + one chord: no 4-clique (the other chord is missing)
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    assert k4_count(edges_df(spark, pairs)).collect()[0]["k4"] == 0


def test_k4_random_matches_brute(spark):
    for seed, n, m in [(7, 12, 40), (8, 10, 44), (9, 16, 60)]:
        rnd = random.Random(seed)
        pairs = [(rnd.randrange(n), rnd.randrange(n)) for _ in range(m)]
        got = k4_count(edges_df(spark, pairs)).collect()[0]["k4"]
        assert got == k4_brute(pairs)


# ---- global transitivity ----------------------------------------------------


def _transitivity(spark, pairs):
    from l_space_spark.operators.graphstats import global_transitivity

    return global_transitivity(edges_df(spark, pairs)).collect()[0]


def test_transitivity_triangle_is_one(spark):
    r = _transitivity(spark, [(1, 2), (2, 3), (3, 1)])
    assert (r["triangles"], r["wedges"], r["transitivity_e6"]) == (1, 3, 1000000)


def test_transitivity_star_is_zero(spark):
    r = _transitivity(spark, [(0, 1), (0, 2), (0, 3)])
    assert (r["triangles"], r["wedges"], r["transitivity_e6"]) == (0, 3, 0)


def test_transitivity_no_wedges_null(spark):
    r = _transitivity(spark, [(1, 2), (3, 4)])
    assert r["wedges"] == 0 and r["transitivity_e6"] is None


def test_transitivity_random_matches_twin(spark):
    rng = random.Random(5)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(120)]
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    tri = sum(
        1
        for a in adj for b in adj[a] if a < b
        for c in adj[b] if b < c and c in adj[a]
    )
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    r = _transitivity(spark, pairs)
    assert (r["triangles"], r["wedges"]) == (tri, wedges)
    assert r["transitivity_e6"] == (6000000 * tri + wedges) // (2 * wedges)


# ---- average neighbor degree ------------------------------------------------


def test_avg_neighbor_degree_star(spark):
    from l_space_spark.operators.graphstats import avg_neighbor_degree

    got = {r["d"]: (r["n_ends"], r["knn_e6"]) for r in
           avg_neighbor_degree(edges_df(spark, [(0, 1), (0, 2), (0, 3)]))
           .collect()}
    # leaves (d=1) neighbor the hub (d=3); the hub's 3 ends neighbor leaves
    assert got == {1: (3, 3000000), 3: (3, 1000000)}


def test_avg_neighbor_degree_random_matches_twin(spark):
    from l_space_spark.operators.graphstats import avg_neighbor_degree

    rng = random.Random(11)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(150)]
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    by_d = defaultdict(lambda: [0, 0])
    for a in adj:
        for b in adj[a]:
            by_d[len(adj[a])][0] += 1
            by_d[len(adj[a])][1] += len(adj[b])
    want = {
        d: (n, (2000000 * sy + n) // (2 * n)) for d, (n, sy) in by_d.items()
    }
    got = {r["d"]: (r["n_ends"], r["knn_e6"]) for r in
           avg_neighbor_degree(edges_df(spark, pairs)).collect()}
    assert got == want


def test_attack_robustness(spark):
    """Hub deletion fragments a star; k=0 matches plain CC; counts are
    (survivors, giant)."""
    from l_space_spark.operators.graphstats import attack_robustness

    from conftest import edges_df

    # two stars (hubs 0 and 100) bridged by an edge between the hubs
    pairs = ([(0, i) for i in range(1, 10)]
             + [(100, 100 + i) for i in range(1, 10)] + [(0, 100)])
    res = attack_robustness(spark, edges_df(spark, pairs), ks=(0, 1, 2))
    got = {r["k"]: (r["n_left"], r["giant"]) for r in res.collect()}
    assert got[0] == (20, 20)       # one bridged component
    # k=1 removes hub 0 (degree 10 > hub 100's 10? tie -> lowest id): star
    # 100 survives intact (10 verts), star 0's leaves isolate
    assert got[1] == (19, 10)
    assert got[2] == (18, 1)        # both hubs gone: 18 singletons
