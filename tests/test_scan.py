"""SCAN structural clustering: python twin + role semantics."""

from l_space_spark.operators.scan import scan_clusters

from conftest import edges_df


def twin(pairs, eps_num, eps_den, mu):
    links = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj = {}
    for u, v in links:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    sim = {
        (u, v)
        for u, v in links
        if (len(adj[u] & adj[v]) + 2) ** 2 * eps_den**2
        >= eps_num**2 * (len(adj[u]) + 1) * (len(adj[v]) + 1)
    }
    nsim = {}
    for u, v in sim:
        nsim[u] = nsim.get(u, 0) + 1
        nsim[v] = nsim.get(v, 0) + 1
    cores = {x for x in adj if nsim.get(x, 0) + 1 >= mu}
    parent = {c: c for c in cores}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in sim:
        if u in cores and v in cores:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
    label = {c: find(c) for c in cores}
    out = {c: (label[c], "core") for c in cores}
    for u, v in sim:
        for b, c in ((u, v), (v, u)):
            if b not in cores and c in cores:
                cur = out.get(b)
                lab = label[c]
                if cur is None or lab < cur[0]:
                    out[b] = (lab, "border")
    # snapshot the core/border assignments BEFORE classifying hubs/
    # outliers: the neighbor-cluster set must see only real cluster
    # labels, never the -1 of an earlier-classified hub/outlier (the
    # operator and oracle both count distinct clusters of ASSIGNED
    # neighbors only)
    assigned = dict(out)
    for x in adj:
        if x in out:
            continue
        ncl = {assigned[n][0] for n in adj[x] if n in assigned}
        out[x] = (-1, "hub" if len(ncl) >= 2 else "outlier")
    return out


def test_matches_python_twin(spark):
    import random

    rng = random.Random(11)
    # two planted dense blocks + sparse noise: cores, borders, hubs,
    # outliers all appear
    pairs = []
    for base in (0, 10):
        blk = list(range(base, base + 8))
        for i in blk:
            for j in blk:
                if i < j and rng.random() < 0.8:
                    pairs.append((i, j))
    pairs += [(rng.randrange(30), rng.randrange(30)) for _ in range(25)]
    got = {
        r["id"]: (r["cluster"], r["role"])
        for r in scan_clusters(
            spark, edges_df(spark, pairs), eps_num=3, eps_den=5, mu=3
        ).collect()
    }
    want = twin(pairs, 3, 5, 3)
    assert got == want
    roles = {v[1] for v in got.values()}
    assert "core" in roles and "outlier" in roles  # non-degenerate fixture


def test_triangle_with_pendant(spark):
    # triangle {0,1,2} at eps=1/2: every edge is ε-similar
    # (σ = 3/3 = 1); with μ=3 all three are cores in one cluster.
    # 3–0 pendant: σ(3,0) = 2/sqrt(2·4) = 1/√2 ≥ 1/2 → border.
    # 4–5 isolated dyad: σ = 1 → ε-similar but nsim+1 = 2 < μ → not
    # cores, not adjacent to any core → outliers.
    pairs = [(0, 1), (1, 2), (2, 0), (3, 0), (4, 5)]
    got = {
        r["id"]: (r["cluster"], r["role"])
        for r in scan_clusters(
            spark, edges_df(spark, pairs), eps_num=1, eps_den=2, mu=3
        ).collect()
    }
    assert got[0] == (0, "core")
    assert got[1] == (0, "core")
    assert got[2] == (0, "core")
    assert got[3] == (0, "border")
    assert got[4] == (-1, "outlier")
    assert got[5] == (-1, "outlier")


def test_hub_between_two_clusters(spark):
    # two triangles bridged by vertex 6: at eps=1/2, μ=3 the triangles
    # are cluster cores; 6's similarity to each triangle vertex is
    # 2/sqrt(3·4) ≈ 0.577 ≥ 1/2 → 6 is ε-similar... so pick eps=3/4 to
    # keep 6 unattached: 6 sees two clusters → hub
    t1, t2 = [(0, 1), (1, 2), (2, 0)], [(3, 4), (4, 5), (5, 3)]
    bridge = [(6, 0), (6, 3)]
    got = {
        r["id"]: (r["cluster"], r["role"])
        for r in scan_clusters(
            spark, edges_df(spark, t1 + t2 + bridge),
            eps_num=3, eps_den=4, mu=3,
        ).collect()
    }
    assert got[6] == (-1, "hub")
    assert {got[i][0] for i in (1, 2)} == {0}
    assert {got[i][0] for i in (4, 5)} == {3}


def test_unconverged_core_graph_raises(spark):
    import pytest

    # a long path of mutually ε-similar cores: hash-min needs one
    # superstep per hop, so max_iters=1 cannot converge on 12 cores
    pairs = []
    for i in range(12):
        pairs += [(3 * i, 3 * i + 3), (3 * i, 3 * i + 1),
                  (3 * i, 3 * i + 2), (3 * i + 1, 3 * i + 2)]
    with pytest.raises(RuntimeError, match="did not converge"):
        scan_clusters(spark, edges_df(spark, pairs),
                      eps_num=1, eps_den=2, mu=2, max_iters=1).collect()
