"""Item-item co-occurrence similarity (operators/cooccurrence.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from l_space_spark.operators.cooccurrence import item_cooccurrence_topk


def test_cooccurrence_scores_and_topk(spark):
    # baskets: {1,2,3}, {1,2}, {1,4} -> deg: 1:3, 2:2, 3:1, 4:1
    rows = [(10, 1), (10, 2), (10, 3), (11, 1), (11, 2), (12, 1), (12, 4),
            (12, 4)]  # duplicate membership collapsed
    b = spark.createDataFrame(rows, "o long, p long")
    out = {(r["item"], r["neighbor"]): r
           for r in item_cooccurrence_topk(b, "o", "p", k=2).collect()}
    # cooc(1,2)=2 -> score = 4e6 div (3*2) = 666666
    assert out[(1, 2)]["cooc"] == 2 and out[(1, 2)]["score_e6"] == 666666
    # cooc(2,3)=1 -> 1e6 div 2 = 500000
    assert out[(2, 3)]["score_e6"] == 500000
    # item 1 has 3 candidates (2,3,4) but k=2: keeps 2 (666666) and then
    # the tie between 3 and 4 (both 1e6 div 3 = 333333) breaks by id -> 3
    got1 = sorted((n, r["rnk"]) for (i, n), r in out.items() if i == 1)
    assert got1 == [(2, 1), (3, 2)]
    # symmetric: neighbor lists exist for leaf items too
    assert out[(4, 1)]["cooc"] == 1 and out[(4, 1)]["score_e6"] == 333333


def test_cooccurrence_basket_cap(spark):
    # one viral basket of 10 items; cap at 4 -> at most C(4,2)=6 pairs
    rows = [(1, p) for p in range(10)]
    b = spark.createDataFrame(rows, "o long, p long")
    uncapped = item_cooccurrence_topk(b, "o", "p", k=20)
    assert uncapped.where("rnk = 1").count() == 10  # 45 pairs, 10 items
    capped = item_cooccurrence_topk(b, "o", "p", k=20, max_basket=4)
    pairs = capped.select("item", "neighbor").count()
    assert pairs == 4 * 3  # 6 undirected pairs, both directions
    # deterministic: same winners on rerun
    again = item_cooccurrence_topk(b, "o", "p", k=20, max_basket=4)
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, again.collect()))
