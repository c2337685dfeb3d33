"""FastRP embeddings: python twin + structural invariants."""

import hashlib

from l_space_spark.operators.fastrp import fastrp_embeddings

from conftest import edges_df


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def tdiv(a: int, b: int) -> int:
    return a // b if a >= 0 else -((-a) // b)


def twin(pairs, dims, iters, scale):
    links = {(s, d) for s, d in pairs if s != d}
    verts = sorted({v for e in links for v in e})
    indeg = {}
    for _, d in links:
        indeg[d] = indeg.get(d, 0) + 1
    x = {(v, k): (scale if h60(f"{v}:{k}") % 2 == 0 else -scale)
         for v in verts for k in range(dims)}
    acc = {(v, k): 0 for v in verts for k in range(dims)}
    for _ in range(iters):
        m = {}
        for s, d in links:
            for k in range(dims):
                if (s, k) in x:
                    m[(d, k)] = m.get((d, k), 0) + x[(s, k)]
        x = {vk: tdiv(val, indeg[vk[0]]) for vk, val in m.items()}
        for vk, val in x.items():
            acc[vk] += val
    return acc


def test_matches_python_twin(spark):
    import random

    rng = random.Random(3)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(90)]
    got = {(r["id"], r["dim"]): r["emb"]
           for r in fastrp_embeddings(
               edges_df(spark, pairs), dims=4, iters=3).collect()}
    assert got == twin(pairs, 4, 3, 1 << 20)


def test_grid_is_complete_and_bounded(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (3, 0)]  # 3 has no in-edge
    res = fastrp_embeddings(edges_df(spark, pairs), dims=8, iters=3)
    rows = res.collect()
    assert len(rows) == 4 * 8
    got = {(r["id"], r["dim"]): r["emb"] for r in rows}
    assert all(got[(3, k)] == 0 for k in range(8))  # dead vector
    assert all(abs(v) <= 3 * (1 << 20) for v in got.values())


def test_embedding_is_a_function_of_in_neighborhood(spark):
    # hop sums start at hop 1, so the embedding encodes the incoming
    # structure ONLY: vertices with identical in-neighborhoods (1 and 2,
    # both fed by just 0) embed identically — guaranteed by arithmetic,
    # not hash luck.  Vertex 3 (fed by 1) differs from 1 whenever some
    # dim has sign(1,k) ≠ sign(2,k) or sign(0,k) ≠ sign(1,k) — true for
    # these fixed md5 seeds across 8 dims (pinned, deterministic).
    pairs = [(0, 1), (0, 2), (1, 0), (2, 0), (1, 3)]
    got = {(r["id"], r["dim"]): r["emb"]
           for r in fastrp_embeddings(
               edges_df(spark, pairs), dims=8, iters=2).collect()}
    v1 = [got[(1, k)] for k in range(8)]
    v2 = [got[(2, k)] for k in range(8)]
    v3 = [got[(3, k)] for k in range(8)]
    assert v1 == v2
    assert v3 != v1


def test_iters_zero_rejected(spark):
    import pytest as _pt

    with _pt.raises(ValueError, match="iters"):
        fastrp_embeddings(edges_df(spark, [(0, 1)]), dims=4, iters=0)


def test_dims_zero_rejected(spark):
    import pytest as _pt

    with _pt.raises(ValueError, match="dims"):
        fastrp_embeddings(edges_df(spark, [(0, 1)]), dims=0, iters=1)
