"""Property-based tests (hypothesis) — random graphs against the
pure-Python oracles. A testing tier the reference lacks entirely
(SURVEY §5.1 "Not present: property-based/randomized testing").

Each example runs real Spark jobs, so example counts are small and the
deadline is disabled; shrinking still gives a minimal failing edge list
if an invariant ever breaks.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from l_space_spark.operators.components import (
    connected_components,
    connected_components_star,
)
from l_space_spark.operators.pagerank import pagerank
from l_space_spark.operators.triangles import triangle_count, triangles_per_vertex

from conftest import edges_df
from oracles import components_oracle, pagerank_oracle, triangles_oracle

# small random directed multigraphs (self-loops and duplicates included on
# purpose — the operators must canonicalize them)
edge_lists = st.lists(
    st.tuples(st.integers(0, 24), st.integers(0, 24)),
    min_size=1,
    max_size=60,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _has_real_edge(pairs) -> bool:
    return any(s != d for s, d in pairs)


@given(pairs=edge_lists)
@settings(**SETTINGS)
def test_pagerank_invariants_and_oracle(spark, pairs):
    if not _has_real_edge(pairs):
        pairs = pairs + [(0, 1)]
    res = pagerank(spark, edges_df(spark, pairs), tol=0.0, max_iters=5,
                   resume=False)
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    want, _ = pagerank_oracle(pairs, tol=0.0, max_iters=5)
    assert set(got) == set(want)
    # rank mass is conserved every run (dangling redistribution correct)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-9, k


@given(pairs=edge_lists)
@settings(**SETTINGS)
def test_components_both_algorithms_match_union_find(spark, pairs):
    if not _has_real_edge(pairs):
        pairs = pairs + [(0, 1)]
    e = edges_df(spark, pairs)
    want = components_oracle(pairs)
    a = {r["id"]: r["component"]
         for r in connected_components(spark, e, resume=False).state.collect()}
    b = {r["id"]: r["component"]
         for r in connected_components_star(spark, e, resume=False).state.collect()}
    assert a == want
    assert b == want


@given(pairs=edge_lists)
@settings(**SETTINGS)
def test_triangles_match_bruteforce(spark, pairs):
    if not _has_real_edge(pairs):
        pairs = pairs + [(0, 1)]
    e = edges_df(spark, pairs)
    n_want, per_want = triangles_oracle(pairs)
    assert triangle_count(spark, e) == n_want
    got = {r["id"]: r["triangles"]
           for r in triangles_per_vertex(spark, e).collect()}
    assert got == per_want


@given(pairs=edge_lists, iters=st.integers(1, 4))
@settings(**SETTINGS)
def test_labelprop_fixed_rounds_match_oracle(spark, pairs, iters):
    from l_space_spark.operators.labelprop import label_propagation
    from oracles import labelprop_oracle

    if not _has_real_edge(pairs):
        pairs = pairs + [(0, 1)]
    res = label_propagation(spark, edges_df(spark, pairs), max_iters=iters,
                            fixed_iters=True, resume=False)
    got = {r["id"]: r["label"] for r in res.state.collect()}
    assert got == labelprop_oracle(pairs, iters=iters)


@given(pairs=edge_lists)
@settings(**SETTINGS)
def test_pagerank_csr_blocks_match_oracle(spark, pairs):
    """The packed-CSR kernel on random multigraphs — exercises block
    packing corner cases (empty blocks, single-source blocks, dst-only
    vertices in a block's rank slice)."""
    if not _has_real_edge(pairs):
        pairs = pairs + [(0, 1)]
    res = pagerank(spark, edges_df(spark, pairs), tol=0.0, max_iters=4,
                   impl="csr", num_partitions=4, resume=False)
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    want, _ = pagerank_oracle(pairs, tol=0.0, max_iters=4)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-9, k


def _weighted_pr_oracle(edges_w, iters, d=0.85):
    agg: dict[tuple[int, int], float] = {}
    for s, t, w in edges_w:
        if s != t:
            agg[(s, t)] = agg.get((s, t), 0.0) + w
    verts = sorted({v for e in agg for v in e})
    n = len(verts)
    out: dict[int, float] = {}
    for (s, _), w in agg.items():
        out[s] = out.get(s, 0.0) + w
    r = {v: 1.0 / n for v in verts}
    for _ in range(iters):
        mass = sum(r[v] for v in verts if v not in out)
        contrib: dict[int, float] = {v: 0.0 for v in verts}
        for (s, t) in sorted(agg):
            contrib[t] += r[s] * agg[(s, t)] / out[s]
        r = {v: (1 - d) / n + d * (mass / n + contrib[v]) for v in verts}
    return r


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15), st.integers(1, 3)),
        min_size=1, max_size=40,
    )
)
@settings(**SETTINGS)
def test_weighted_pagerank_matches_oracle(spark, pairs):
    if not any(s != d for s, d, _ in pairs):
        pairs = pairs + [(0, 1, 2)]
    e = spark.createDataFrame(
        [(int(s), int(d), float(w)) for s, d, w in pairs],
        "src long, dst long, wt double",
    )
    res = pagerank(spark, e, tol=0.0, max_iters=4, weight_col="wt",
                   resume=False)
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    want = _weighted_pr_oracle(pairs, iters=4)
    assert set(got) == set(want)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-9, k


def _hits_oracle_py(pairs, iters):
    links = sorted({(s, d) for s, d in pairs if s != d})
    verts = sorted({v for e in links for v in e})
    n = len(verts)
    hub = {v: 1.0 / n for v in verts}
    auth = {}
    for _ in range(iters):
        auth = {v: 0.0 for v in verts}
        for s, d in links:
            auth[d] += hub[s]
        t = sum(auth.values())
        auth = {v: a / t for v, a in auth.items()}
        hub = {v: 0.0 for v in verts}
        for s, d in links:
            hub[s] += auth[d]
        t = sum(hub.values())
        hub = {v: h / t for v, h in hub.items()}
    return hub, auth


@given(pairs=edge_lists)
@settings(**SETTINGS)
def test_hits_matches_oracle(spark, pairs):
    from l_space_spark.operators.hits import hits

    if not any(s != d for s, d in pairs):
        pairs = pairs + [(0, 1)]
    res = hits(spark, edges_df(spark, pairs), tol=-1.0, max_iters=4,
               resume=False)
    got = {r["id"]: (r["hub"], r["auth"]) for r in res.state.collect()}
    hub, auth = _hits_oracle_py(pairs, iters=4)
    assert set(got) == set(hub)
    for v in hub:
        assert abs(got[v][0] - hub[v]) <= 1e-9, ("hub", v)
        assert abs(got[v][1] - auth[v]) <= 1e-9, ("auth", v)


def _kcore_oracle_py(pairs, k):
    nbrs: dict[int, set[int]] = {}
    for s, d in pairs:
        if s != d:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
    alive = set(nbrs)
    while True:
        drop = {v for v in alive
                if len(nbrs[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {v: len(nbrs[v] & alive) for v in alive}


@given(pairs=edge_lists, k=st.integers(1, 4))
@settings(**SETTINGS)
def test_kcore_matches_oracle(spark, pairs, k):
    from l_space_spark.operators.kcore import kcore

    if not any(s != d for s, d in pairs):
        pairs = pairs + [(0, 1)]
    res = kcore(spark, edges_df(spark, pairs), k=k, resume=False)
    got = {r["id"]: r["core_deg"] for r in res.state.collect()}
    assert got == _kcore_oracle_py(pairs, k)


@given(pairs=edge_lists)
@settings(**SETTINGS)
def test_components_csr_matches_oracle(spark, pairs):
    """CSR hash-min CC (cogroup + np.minimum.reduceat over packed blocks)
    must equal the union-find oracle AND the dataframe path exactly —
    integer min, no fp concerns."""
    if not _has_real_edge(pairs):
        pairs = pairs + [(0, 1)]
    e = edges_df(spark, pairs)
    want = components_oracle(pairs)
    got = {r["id"]: r["component"]
           for r in connected_components(
               spark, e, impl="csr", num_partitions=4, resume=False
           ).state.collect()}
    assert got == want


@given(pairs=edge_lists, iters=st.integers(1, 4))
@settings(**SETTINGS)
def test_labelprop_csr_matches_oracle(spark, pairs, iters):
    """CSR LP (per-block run-length label counts + JVM-side argmax) must
    equal the synchronous min-tie-break oracle exactly."""
    from l_space_spark.operators.labelprop import label_propagation
    from oracles import labelprop_oracle

    if not _has_real_edge(pairs):
        pairs = pairs + [(0, 1)]
    res = label_propagation(spark, edges_df(spark, pairs), max_iters=iters,
                            fixed_iters=True, impl="csr", num_partitions=4,
                            resume=False)
    got = {r["id"]: r["label"] for r in res.state.collect()}
    assert got == labelprop_oracle(pairs, iters=iters)


@given(
    fps=st.lists(st.integers(0, (1 << 60) - 1), min_size=2, max_size=40),
    max_h=st.integers(1, 8),
)
@settings(**SETTINGS)
def test_simhash_banded_pairs_match_bruteforce(spark, fps, max_h):
    """Pigeonhole banding is lossless: the banded equi-join + exact verify
    finds EXACTLY the pairs a brute-force O(n²) Hamming scan finds, for any
    fingerprints and any threshold (bands = max_h+1 ⇒ ≤max_h differing
    bits leave ≥1 band identical)."""
    from l_space_spark.operators.dedup import simhash_close_pairs

    sims = spark.createDataFrame(
        [(i, f) for i, f in enumerate(fps)], "id long, simhash long"
    )
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in simhash_close_pairs(sims, bits=60, max_hamming=max_h).collect()
    }
    # generalized block-combination variant (wider keys) — same theorem,
    # must give the identical exact result
    got10 = {
        (r["a"], r["b"], r["hamming"])
        for r in simhash_close_pairs(
            sims, bits=60, max_hamming=max_h, n_blocks=max_h + 4
        ).collect()
    }
    want = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            h = bin(fps[i] ^ fps[j]).count("1")
            if h <= max_h:
                want.add((i, j, h))
    assert got == want
    assert got10 == want


@given(pairs=edge_lists)
@settings(**SETTINGS)
def test_sssp_matches_bellman_ford(spark, pairs):
    """SSSP (converged mode) vs an inline Bellman-Ford on random
    multigraphs — parallel edges keep the min weight, self-loops drop,
    unreachable stays None; integer-exact."""
    from l_space_spark.operators.sssp import sssp

    if not _has_real_edge(pairs):
        pairs = pairs + [(0, 1)]
    wpairs = {}
    for s, d in pairs:
        if s != d:
            w = 1 + (s + d) % 3
            wpairs[(s, d)] = min(w, wpairs.get((s, d), w))
    verts = {v for e in wpairs for v in e}
    src = min(verts)
    dist = {v: None for v in verts}
    dist[src] = 0
    for _ in range(len(verts)):
        for (s, d), w in wpairs.items():
            if dist[s] is not None and (
                dist[d] is None or dist[s] + w < dist[d]
            ):
                dist[d] = dist[s] + w

    e = edges_df(spark, pairs)
    from pyspark.sql import functions as F
    e = e.withColumn(
        "wt", F.lit(1) + F.pmod(F.col("src") + F.col("dst"), F.lit(3))
    )
    res = sssp(spark, e, source=src, weight_col="wt", resume=False)
    got = {r["id"]: r["dist"] for r in res.state.collect()}
    assert got == dist


@given(pairs=edge_lists)
@settings(**SETTINGS)
def test_multi_source_bfs_matches_python_bfs(spark, pairs):
    """Multi-source BFS (converged) vs an inline per-source BFS: hop
    distances for the 3 lowest-id sources; unreached pairs absent."""
    from collections import deque

    from l_space_spark.operators.centrality import multi_source_bfs

    if not _has_real_edge(pairs):
        pairs = pairs + [(0, 1)]
    adj = {}
    verts = set()
    for s, d in pairs:
        if s != d:
            adj.setdefault(s, set()).add(d)
            verts |= {s, d}
    srcs = sorted(verts)[:3]
    want = set()
    for s in srcs:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        want |= {(s, v, d) for v, d in dist.items()}

    e = edges_df(spark, pairs)
    sdf = spark.createDataFrame([(s,) for s in srcs], "id long")
    # max_iters must cover the worst diameter the strategy can generate
    # (a 25-vertex chain needs 24 hops); the default 20 would truncate
    res = multi_source_bfs(spark, e, sdf, max_iters=30, resume=False)
    got = {(r["bsrc"], r["id"], r["dist"]) for r in res.state.collect()}
    assert got == want


doc_corpora = st.lists(
    st.lists(st.sampled_from("abcdefq"), min_size=0, max_size=24).map(
        lambda cs: " ".join(cs)
    ),
    min_size=1,
    max_size=10,
)


@given(texts=doc_corpora)
@settings(**SETTINGS)
def test_paragraph_dedup_invariants(spark, texts):
    from l_space_spark.operators.dedup import paragraph_dedup_stats

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = paragraph_dedup_stats(df, "doc_id", "text", para_tokens=3).collect()
    assert {r["id"] for r in out} == set(range(len(texts)))
    n_tok = {i: len(t.split()) if t.strip() else 0 for i, t in rows}
    total_paras = total_kept = 0
    for r in out:
        # paragraph count is ceil(n/3); kept tokens never exceed doc tokens
        assert r["n_paras"] == -(-n_tok[r["id"]] // 3)
        assert 0 <= r["n_dup_paras"] <= r["n_paras"]
        assert 0 <= r["kept_tokens"] <= n_tok[r["id"]]
        total_paras += r["n_paras"]
        total_kept += r["n_paras"] - r["n_dup_paras"]
    # corpus-wide: exactly one kept instance per distinct paragraph text
    distinct = set()
    for i, t in rows:
        ts = t.split()
        for j in range(0, len(ts), 3):
            distinct.add(" ".join(ts[j:j + 3]))
    assert total_kept == len(distinct)


@given(
    pairs=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                   min_size=1, max_size=12, unique=True),
    wts=st.dictionaries(st.integers(0, 9), st.integers(1, 50),
                        min_size=1, max_size=10),
)
@settings(**SETTINGS)
def test_negative_samples_invariants(spark, pairs, wts):
    from l_space_spark.operators.sampling import negative_samples

    out = negative_samples(
        spark,
        spark.createDataFrame(pairs, "center long, context long"),
        spark.createDataFrame(list(wts.items()), "id long, w long"),
        k=2, blocks=4,
    ).collect()
    # exactly k draws per pair, every negative is a weighted id
    assert len(out) == 2 * len(pairs)
    assert {(r["center"], r["context"], r["k"]) for r in out} == {
        (c, x, j) for c, x in pairs for j in range(2)
    }
    assert all(r["neg"] in wts for r in out)


# random tiny corpora over a 6-word vocabulary: maximal shingle
# collisions (hot shingles shared by most docs — the regime the prefix
# filter must stay lossless in), doc lengths 0..8 so the <n-token
# empty-shingle edge is generated too
_VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff"]
doc_lists = st.lists(
    st.lists(st.integers(0, 5), min_size=0, max_size=8),
    min_size=2,
    max_size=12,
)


def _docs_df(spark, docs):
    rows = [(i, " ".join(_VOCAB[w] for w in ws))
            for i, ws in enumerate(docs)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sets(docs, n=3):
    return {
        i: {" ".join(_VOCAB[w] for w in ws[j:j + n])
            for j in range(len(ws) - n + 1)}
        for i, ws in enumerate(docs)
    }


@given(docs=doc_lists)
@settings(**SETTINGS)
def test_ngram_jaccard_prefix_filter_lossless(spark, docs):
    """The PPJoin prefix-filtered candidate generation must be exactly
    lossless vs brute-force all-pairs shingle Jaccard on ANY corpus."""
    from l_space_spark.operators.dedup import ngram_jaccard_pairs

    sets = _sets(docs)
    ids = sorted(i for i in sets if sets[i])
    want = set()
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            i = len(sets[a] & sets[b])
            if 3 * i >= len(sets[a]) + len(sets[b]):
                want.add((a, b))
    got = {(r["a"], r["b"]) for r in
           ngram_jaccard_pairs(_docs_df(spark, docs), "doc_id").collect()}
    assert got == want


@given(docs=doc_lists)
@settings(**SETTINGS)
def test_containment_prefix_filter_lossless(spark, docs):
    """The asymmetric (min-size overlap bound) prefix filter must
    reproduce brute-force containment rows exactly on ANY corpus."""
    from l_space_spark.operators.dedup import containment_pairs

    sets = _sets(docs)
    ids = sorted(i for i in sets if sets[i])
    want = {}
    for a in ids:
        for b in ids:
            if a != b:
                i = len(sets[a] & sets[b])
                if 5 * i >= 3 * len(sets[a]):
                    want[(a, b)] = (i, len(sets[a]))
    got = {(r["a"], r["b"]): (r["common"], r["na"])
           for r in containment_pairs(_docs_df(spark, docs), "doc_id",
                                      c_num=3, c_den=5).collect()}
    assert got == want
