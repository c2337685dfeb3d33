"""GraphSAGE-style k-hop fanout sampling (operators/sage.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from l_space_spark.operators.sage import khop_fanout_sample


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _replica(edges, seeds, fanouts, tag="sage"):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
    rows = set()
    frontier = {(s, s) for s in seeds}
    for h, fan in enumerate(fanouts, start=1):
        nxt = set()
        for seed, v in frontier:
            cands = sorted(
                adj.get(v, ()),
                key=lambda d: (_h60(f"{tag}:{h}:{seed}:{v}:{d}"), d),
            )[:fan]
            for d in cands:
                rows.add((seed, h, v, d))
                nxt.add((seed, d))
        frontier = nxt
    return rows


def test_khop_fanout_matches_replica(spark):
    edges = [
        (0, i) for i in range(1, 9)          # hub: seed 0 has 8 neighbors
    ] + [
        (1, 2), (1, 3), (2, 4), (3, 4), (4, 0), (5, 5),  # incl self-loop
        (2, 5), (2, 6), (2, 7), (3, 8),
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (1,)], "seed long")
    out = khop_fanout_sample(spark, e, seeds, fanouts=(3, 2), shards=4)
    got = {(r["seed"], r["hop"], r["src"], r["dst"]) for r in out.collect()}
    assert got == _replica(edges, [0, 1], (3, 2))
    # fanout caps respected per (seed, parent)
    caps = (
        out.groupBy("seed", "hop", "src").count()
        .agg(F.max("count")).collect()[0][0]
    )
    assert caps <= 3
    # hop-1 parents are exactly the seeds
    assert {r["src"] for r in out.where("hop = 1").collect()} == {0, 1}
    # deterministic: a second run draws the identical sample
    again = khop_fanout_sample(spark, e, seeds, fanouts=(3, 2), shards=4)
    assert {tuple(r) for r in again.collect()} == got


def test_khop_fanout_degenerate(spark):
    e = spark.createDataFrame([(7, 7)], "src long, dst long")  # loops only
    seeds = spark.createDataFrame([(7,)], "seed long")
    assert khop_fanout_sample(spark, e, seeds, fanouts=(2,)).count() == 0
    empty = spark.createDataFrame([], "src long, dst long")
    assert khop_fanout_sample(spark, empty, seeds, fanouts=(2, 2)).count() == 0


def test_neighbor_feature_sums(spark):
    from l_space_spark.operators.sage import neighbor_feature_sums

    feats = spark.createDataFrame(
        [(1, [0.25, -1.5]), (2, [1.0, 2.0]), (3, [0.0000004, 0.5])],
        "id long, vec array<float>",
    )
    edges = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (11, 3), (11, 3)],  # 11->3 multi-edge
        "src long, dst long",
    )
    out = {r["id"]: r for r in neighbor_feature_sums(
        edges, feats, dim=2).collect()}
    # half-up fixed point: q(0.25)=250000; q(-1.5)=floor(-1499999.5)
    # = -1500000; q(4e-7)=floor(0.9)=0; q(0.5)=500000
    assert out[10]["n_nbrs"] == 3
    assert out[10]["q0"] == 250000 + 1000000 + 0
    assert out[10]["q1"] == -1500000 + 2000000 + 500000
    assert out[11]["n_nbrs"] == 2 and out[11]["q1"] == 1000000
    assert set(out) == {10, 11}  # only vertices with out-edges
