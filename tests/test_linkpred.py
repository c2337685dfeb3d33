"""Neighbor-Jaccard link prediction vs brute-force python oracle."""

import random

from l_space_spark.operators.linkpred import neighbor_jaccard

from conftest import edges_df


def brute(pairs, max_hub=None, min_common=1):
    adj = {}
    for s, d in pairs:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    hubs = {v for v in adj if max_hub is None or len(adj[v]) <= max_hub}
    out = {}
    cand = set()
    for v in hubs:
        ns = sorted(adj[v])
        for i, u in enumerate(ns):
            for w in ns[i + 1:]:
                cand.add((u, w))
    import math
    for u, w in cand:
        common = len({v for v in adj[u] & adj[w] if v in hubs})
        if common >= min_common:
            jac = common / (len(adj[u]) + len(adj[w]) - common)
            out[(u, w)] = (common, math.floor(jac * 1e6 + 0.5))
    return out


def _run(spark, pairs, **kw):
    return {(r["u"], r["w"]): (r["common"], r["jaccard_e6"])
            for r in neighbor_jaccard(edges_df(spark, pairs), **kw).collect()}


def test_square_with_diagonal(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    got = _run(spark, pairs)
    assert got == brute(pairs)
    # 1 and 3 share neighbors {0, 2}: jaccard 2/(2+2-2)=1.0
    assert got[(1, 3)] == (2, 1_000_000)


def test_random_matches_brute(spark):
    rng = random.Random(5)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(60)]
    assert _run(spark, pairs) == brute(pairs)


def test_hub_cap_drops_celebrity_wedges(spark):
    # celebrity 99 adjacent to everyone; with the cap its wedges vanish
    pairs = [(99, i) for i in range(10)] + [(0, 1), (1, 2)]
    got = _run(spark, pairs, max_hub_degree=5)
    assert got == brute(pairs, max_hub=5)
    # no pair generated THROUGH the celebrity: (3,4) only share hub 99
    assert (3, 4) not in got
    # but the celebrity can still be an endpoint (via small hubs 0 and 2)
    assert got[(1, 99)][0] == 2
    uncapped = _run(spark, pairs)
    assert (3, 4) in uncapped


# --- resource allocation ---------------------------------------------------

from l_space_spark.operators.linkpred import resource_allocation  # noqa: E402


def brute_ra(pairs, max_hub=None, min_common=1):
    adj = {}
    for s, d in pairs:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    hubs = {v for v in adj if max_hub is None or len(adj[v]) <= max_hub}
    out = {}
    for v in hubs:
        ns = sorted(adj[v])
        t = 1_000_000 // len(adj[v])
        for i, u in enumerate(ns):
            for w in ns[i + 1:]:
                c, s = out.get((u, w), (0, 0))
                out[(u, w)] = (c + 1, s + t)
    return {k: v for k, v in out.items() if v[0] >= min_common}


def _run_ra(spark, pairs, **kw):
    return {(r["u"], r["w"]): (r["common"], r["ra_e6"])
            for r in resource_allocation(edges_df(spark, pairs),
                                         **kw).collect()}


def test_ra_square_with_diagonal(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    got = _run_ra(spark, pairs)
    assert got == brute_ra(pairs)
    # 1 and 3 share hubs 0 (deg 3) and 2 (deg 3): 2*(1e6 div 3) = 666666
    assert got[(1, 3)] == (2, 666_666)


def test_ra_random_matches_brute(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(60)]
    assert _run_ra(spark, pairs) == brute_ra(pairs)


def test_ra_hub_cap(spark):
    pairs = [(99, i) for i in range(10)] + [(0, 1), (1, 2)]
    got = _run_ra(spark, pairs, max_hub_degree=5)
    assert got == brute_ra(pairs, max_hub=5)
    assert (3, 4) not in got


# --- adamic-adar -------------------------------------------------------------

from l_space_spark.operators.linkpred import adamic_adar  # noqa: E402


def brute_aa(pairs, max_hub=None, min_common=1):
    adj = {}
    for s, d in pairs:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    import math
    hubs = {v for v in adj
            if len(adj[v]) >= 2
            and (max_hub is None or len(adj[v]) <= max_hub)}
    out = {}
    for v in hubs:
        t = math.floor(1e6 / math.log(len(adj[v])) + 0.5)
        ns = sorted(adj[v])
        for i, u in enumerate(ns):
            for w in ns[i + 1:]:
                c, s = out.get((u, w), (0, 0))
                out[(u, w)] = (c + 1, s + t)
    return {k: v for k, v in out.items() if v[0] >= min_common}


def _run_aa(spark, pairs, **kw):
    return {(r["u"], r["w"]): (r["common"], r["aa_e6"])
            for r in adamic_adar(edges_df(spark, pairs), **kw).collect()}


def test_aa_square_with_diagonal(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    got = _run_aa(spark, pairs)
    assert got == brute_aa(pairs)
    # 1 and 3 share hubs 0 (deg 3) and 2 (deg 3): 2/ln(3)
    import math
    t3 = math.floor(1e6 / math.log(3) + 0.5)
    assert got[(1, 3)] == (2, 2 * t3)


def test_aa_degree1_hub_contributes_nothing(spark):
    # hub 5 has degree 1 → excluded by definition (and owns no wedges)
    pairs = [(5, 0), (0, 1), (0, 2)]
    got = _run_aa(spark, pairs)
    assert set(got) == {(1, 2), (1, 5), (2, 5)}  # all via hub 0 (deg 3)


def test_aa_random_matches_brute(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(60)]
    assert _run_aa(spark, pairs) == brute_aa(pairs)


def test_aa_hub_cap(spark):
    pairs = [(99, i) for i in range(10)] + [(0, 1), (1, 2)]
    assert _run_aa(spark, pairs, max_hub_degree=5) == brute_aa(pairs,
                                                               max_hub=5)


# --- preferential attachment -------------------------------------------------

from l_space_spark.operators.linkpred import preferential_attachment  # noqa: E402


def brute_pa(pairs, max_hub=None, min_common=1):
    adj = {}
    for s, d in pairs:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    hubs = {v for v in adj if max_hub is None or len(adj[v]) <= max_hub}
    out = {}
    cand = set()
    for v in hubs:
        ns = sorted(adj[v])
        for i, u in enumerate(ns):
            for w in ns[i + 1:]:
                cand.add((u, w))
    for u, w in cand:
        common = len({v for v in adj[u] & adj[w] if v in hubs})
        if common >= min_common:
            # degree from the FULL graph, cap bounds generation only
            out[(u, w)] = (common, len(adj[u]) * len(adj[w]))
    return out


def _run_pa(spark, pairs, **kw):
    return {(r["u"], r["w"]): (r["common"], r["pa"])
            for r in preferential_attachment(
                edges_df(spark, pairs), **kw).collect()}


def test_pa_square_with_diagonal(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    got = _run_pa(spark, pairs)
    assert got == brute_pa(pairs)
    # deg(1)=2, deg(3)=2 -> pa 4 on the (1,3) candidate
    assert got[(1, 3)] == (2, 4)


def test_pa_random_matches_brute(spark):
    rng = random.Random(17)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(60)]
    assert _run_pa(spark, pairs) == brute_pa(pairs)


def test_pa_hub_cap_bounds_generation_not_degree(spark):
    # celebrity 99 over the cap: no candidates THROUGH it, but where it
    # survives as an endpoint its full degree still enters the product
    pairs = [(99, i) for i in range(10)] + [(0, 1), (1, 2)]
    got = _run_pa(spark, pairs, max_hub_degree=5)
    assert got == brute_pa(pairs, max_hub=5)
    assert (3, 4) not in got
    assert got[(1, 99)] == (2, 3 * 10)  # deg(1)={0,2,99}=3, deg(99)=10


# --- co-citation / bibliographic coupling ----------------------------------

from l_space_spark.operators.linkpred import (  # noqa: E402
    bibliographic_coupling,
    cocitation,
)


def brute_directed(pairs, hub_out=True, cap=None, min_common=1):
    """Directed wedge counts: hub_out=True counts pairs of DSTs sharing
    a citing SRC (co-citation); False counts pairs of SRCs sharing a
    cited DST (coupling). cap bounds the hub's fan-out/fan-in."""
    simple = {(s, d) for s, d in pairs if s != d}
    wedges = {}
    for s, d in simple:
        hub, leaf = (s, d) if hub_out else (d, s)
        wedges.setdefault(hub, set()).add(leaf)
    out = {}
    for hub, leaves in wedges.items():
        if cap is not None and len(leaves) > cap:
            continue
        ls = sorted(leaves)
        for i, u in enumerate(ls):
            for w in ls[i + 1:]:
                out[(u, w)] = out.get((u, w), 0) + 1
    return {k: v for k, v in out.items() if v >= min_common}


def _run_cc(spark, pairs, **kw):
    return {(r["u"], r["w"]): r["cocite"]
            for r in cocitation(edges_df(spark, pairs), **kw).collect()}


def _run_bc(spark, pairs, **kw):
    return {(r["u"], r["w"]): r["coupling"]
            for r in bibliographic_coupling(
                edges_df(spark, pairs), **kw).collect()}


def test_cocitation_basic(spark):
    # 0 cites {1,2,3}; 4 cites {2,3}: cocite(2,3)=2, cocite(1,2)=1
    pairs = [(0, 1), (0, 2), (0, 3), (4, 2), (4, 3)]
    got = _run_cc(spark, pairs)
    assert got == brute_directed(pairs, hub_out=True)
    assert got[(2, 3)] == 2 and got[(1, 2)] == 1


def test_coupling_is_time_reversed_cocitation(spark):
    rng = random.Random(11)
    pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(70)]
    rev = [(d, s) for s, d in pairs]
    assert _run_bc(spark, pairs) == _run_cc(spark, rev)
    assert _run_bc(spark, pairs) == brute_directed(pairs, hub_out=False)


def test_directed_random_matches_brute(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(80)]
    # duplicates + self-loops on purpose: simple-graph normalization
    pairs += pairs[:10] + [(3, 3), (5, 5)]
    assert _run_cc(spark, pairs) == brute_directed(pairs, hub_out=True)
    assert _run_bc(spark, pairs) == brute_directed(pairs, hub_out=False)


def test_directed_fanout_cap(spark):
    pairs = [(99, i) for i in range(10)] + [(0, 1), (0, 2)]
    got = _run_cc(spark, pairs, max_fanout=5)
    assert got == brute_directed(pairs, hub_out=True, cap=5)
    assert (3, 4) not in got and got[(1, 2)] == 1


def test_directed_counts_ignore_extra_edge_columns(spark):
    # parallel (src, dst) rows differing only in a weight column must
    # still collapse to one edge (simple-graph contract)
    rows = [(0, 5, 1.0), (0, 5, 2.0), (1, 5, 9.9), (0, 6, 0.1), (1, 6, 0.2)]
    df = spark.createDataFrame(rows, "src long, dst long, w double")
    got = {(r["u"], r["w"]): r["cocite"] for r in cocitation(df).collect()}
    assert got == {(5, 6): 2}
    got_bc = {(r["u"], r["w"]): r["coupling"]
              for r in bibliographic_coupling(df).collect()}
    assert got_bc == {(0, 1): 2}
