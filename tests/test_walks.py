"""Deterministic random walks vs a pure-python step simulator."""

import hashlib

from pyspark.sql import functions as F

from l_space_spark.operators.walks import random_walks

from conftest import edges_df


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def simulate(pairs, length, n_walks=1, seed="walk"):
    adj = {}
    verts = set()
    for s, d in set(pairs):
        adj.setdefault(s, set()).add(d)
        verts.update((s, d))
    rows = set()
    for v in verts:
        for r in range(n_walks):
            cur = v
            rows.add((v, r, 0, v))
            for k in range(1, length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = min(
                    nbrs, key=lambda d: (h60(f"{seed}:{v}:{r}:{k}:{d}"), d)
                )
                rows.add((v, r, k, cur))
    return rows


def _run(spark, pairs, **kw):
    df = random_walks(spark, edges_df(spark, pairs), num_partitions=4, **kw)
    return {(r["start"], r["r"], r["step"], r["vertex"])
            for r in df.collect()}


def test_walks_match_simulator(spark):
    pairs = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 1), (1, 4)]
    got = _run(spark, pairs, walk_length=5)
    assert got == simulate(pairs, 5)


def test_sink_truncates_walk(spark):
    pairs = [(0, 1), (1, 2)]  # 2 is a sink
    got = _run(spark, pairs, walk_length=4)
    assert got == simulate(pairs, 4)
    # the walk from 0 records exactly steps 0..2 then stops
    assert {(0, 0, 0, 0), (0, 0, 1, 1), (0, 0, 2, 2)} <= got
    assert not any(v == 0 and s > 2 for v, r, s, _ in got)


def test_multiple_walks_independent_streams(spark):
    pairs = [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 0)]
    got = _run(spark, pairs, walk_length=3, n_walks=3)
    want = simulate(pairs, 3, n_walks=3)
    assert got == want
    # replicate walks from vertex 0 should not all pick one neighbor
    firsts = {v for s0, r, s, v in got if s0 == 0 and s == 1}
    assert len(firsts) >= 2


def test_self_loop_walkable(spark):
    got = _run(spark, [(7, 7)], walk_length=3)
    assert got == {(7, 0, k, 7) for k in range(4)}


def test_full_width_hash_ids_no_overflow(spark):
    # the engine's real vertex ids are signed xxhash64 — replicate walks
    # must not overflow or mis-decode (the old start*n_walks+r composite
    # did both; caught by the spark-submit verify drive)
    big = 2**62 + 11
    pairs = [(-big, big), (big, -big)]
    got = _run(spark, pairs, walk_length=2, n_walks=3)
    assert {(s, r) for s, r, _, _ in got} == {
        (v, r) for v in (-big, big) for r in range(3)
    }
    assert got == simulate(pairs, 2, n_walks=3)


# --- node2vec-biased walks ---------------------------------------------------

from l_space_spark.operators.walks import biased_walks  # noqa: E402


def simulate_biased(pairs, length, n_walks=1, seed="n2v",
                    w_ret=1, w_near=4, w_far=16):
    """Pure-python replay: step 1 uniform hash-argmin, steps >= 2 the
    integer replica race over (h, dst, j)."""
    links = set()
    for s, d in set(pairs):
        links.add((s, d))
    adj = {}
    und = set()
    verts = set()
    for s, d in links:
        adj.setdefault(s, []).append(d)
        und.add((min(s, d), max(s, d)))
        verts.update((s, d))
    rows = set()
    for v in verts:
        for r in range(n_walks):
            prev, cur = v, v
            rows.add((v, r, 0, v))
            for k in range(1, length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                best = None
                for d in nbrs:
                    if k == 1:
                        cands = [(h60(f"{seed}:{v}:{r}:{k}:{d}"), d, 1)]
                    else:
                        if d == prev:
                            w = w_ret
                        elif (min(prev, d), max(prev, d)) in und:
                            w = w_near
                        else:
                            w = w_far
                        cands = [
                            (h60(f"{seed}:{v}:{r}:{k}:{d}:{j}"), d, j)
                            for j in range(1, w + 1)
                        ]
                    for c in cands:
                        if best is None or c < best:
                            best = c
                prev, cur = cur, best[1]
                rows.add((v, r, k, cur))
    return rows


def test_biased_matches_simulator(spark):
    import random

    rng = random.Random(21)
    pairs = [(rng.randrange(18), rng.randrange(18)) for _ in range(50)]
    got = {(r["start"], r["r"], r["step"], r["vertex"])
           for r in biased_walks(
               edges_df(spark, pairs).sparkSession,
               edges_df(spark, pairs), walk_length=4, n_walks=2).collect()}
    assert got == simulate_biased(pairs, 4, n_walks=2)


def test_biased_step1_is_uniform_like_random_walks(spark):
    # same hash stream at step 1 (no previous vertex), so with the same
    # seed the first move must equal the uniform sampler's
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 0), (3, 4)]
    e = edges_df(spark, pairs)
    b = {(r["start"], r["r"], r["vertex"])
         for r in biased_walks(spark, e, walk_length=1, seed="s").collect()
         if r["step"] == 1}
    u = {(r["start"], r["r"], r["vertex"])
         for r in random_walks(spark, e, walk_length=1, seed="s").collect()
         if r["step"] == 1}
    assert b == u


def test_biased_return_weight_dominates(spark):
    # two-vertex mutual dyad: every candidate IS the previous vertex, so
    # any weights give the forced back-and-forth
    pairs = [(0, 1), (1, 0)]
    rows = biased_walks(spark, edges_df(spark, pairs), walk_length=3,
                        w_ret=1, w_near=1, w_far=1).collect()
    path0 = [r["vertex"] for r in sorted(
        (r for r in rows if r["start"] == 0), key=lambda r: r["step"])]
    assert path0 == [0, 1, 0, 1]


def test_biased_rejects_bad_weights(spark):
    import pytest

    with pytest.raises(ValueError):
        biased_walks(spark, edges_df(spark, [(0, 1)]), w_ret=0)


def test_skipgram_pairs_match_brute(spark):
    import random
    from collections import Counter

    from l_space_spark.operators.walks import skipgram_pairs

    rng = random.Random(31)
    pairs = [(rng.randrange(15), rng.randrange(15)) for _ in range(45)]
    e = edges_df(spark, pairs)
    w = biased_walks(spark, e, walk_length=4, n_walks=2)
    got = {(r["center"], r["context"]): r["n"]
           for r in skipgram_pairs(w, window=2).collect()}
    rows = simulate_biased(pairs, 4, n_walks=2)
    bywalk = {}
    for start, r, step, v in rows:
        bywalk.setdefault((start, r), {})[step] = v
    want = Counter()
    for seq in bywalk.values():
        for i, ci in seq.items():
            for j, cj in seq.items():
                if i != j and abs(i - j) <= 2:
                    want[(ci, cj)] += 1
    assert got == dict(want)
