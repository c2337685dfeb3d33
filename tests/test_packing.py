"""Chunking + context packing vs brute python twins, and the sharded
prefix sum vs the single-window form it must equal."""

import random

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from l_space_spark.operators.packing import (
    chunk_documents,
    exclusive_prefix_sum,
    pack_contexts,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def brute_chunks(texts, size, overlap):
    stride = size - overlap
    out = []
    for i, t in enumerate(texts):
        last = (max(len(t) - size, 0) + stride - 1) // stride
        for k in range(last + 1):
            c = t[k * stride: k * stride + size]
            out.append((i, k, k * stride + 1, c, len(c)))
    return sorted(out)


def test_chunks_match_brute(spark):
    rng = random.Random(2)
    texts = ["".join(rng.choice("abc d") for _ in range(rng.randrange(1, 40)))
             for _ in range(30)] + [""]
    got = sorted(tuple(r) for r in chunk_documents(
        _docs(spark, texts), chunk_size=10, overlap=3).collect())
    assert got == brute_chunks(texts, 10, 3)


def test_chunks_cover_and_overlap(spark):
    texts = ["x" * 25]
    rows = chunk_documents(
        _docs(spark, texts), chunk_size=10, overlap=5).collect()
    # starts 1, 6, 11, 16 — stride 5; start 16 already reaches char 25,
    # so no redundant trailing chunk is emitted
    assert [r["chunk_start"] for r in rows] == [1, 6, 11, 16]
    assert [r["chunk_len"] for r in rows] == [10, 10, 10, 10]
    # reconstruction: drop the overlap prefix of every later chunk
    whole = rows[0]["chunk_text"] + "".join(
        r["chunk_text"][5:] for r in rows[1:])
    assert whole == texts[0]


def test_chunk_param_validation(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, ["a"]), chunk_size=5, overlap=5)


def test_sharded_prefix_equals_single_window(spark):
    rng = random.Random(9)
    # sparse, unsorted, negative ids — any unique bigint order key
    rows = [(rng.randrange(-500, 500) * 7 + k, rng.randrange(0, 50))
            for k in range(200)]
    rows = list({i: v for i, v in rows}.items())
    df = spark.createDataFrame(rows, "id long, v long")
    got = {r["id"]: r["prefix"] for r in exclusive_prefix_sum(
        df, "id", "v", shard_block=97).collect()}
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = {r["id"]: r["p"] for r in df.select(
        "id", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("p")
    ).collect()}
    assert got == want


def brute_pack(tok_by_id, capacity):
    out, run = {}, 0
    for i in sorted(tok_by_id):
        out[i] = (tok_by_id[i], run // capacity, run % capacity)
        run += tok_by_id[i]
    return out


def test_pack_matches_brute(spark):
    rng = random.Random(4)
    texts = [" ".join("w%d" % rng.randrange(99)
                      for _ in range(rng.randrange(0, 30)))
             for _ in range(60)]
    got = {r["doc_id"]: (r["n_tok"], r["bin"], r["pos_in_bin"])
           for r in pack_contexts(
               _docs(spark, texts), capacity=25, shard_block=7).collect()}
    toks = {i: len([w for w in t.split() if w]) for i, t in enumerate(texts)}
    assert got == brute_pack(toks, 25)
    # bins fill sequentially: doc starting in bin b never precedes one
    # starting in bin b' > b
    order = [got[i][1] for i in sorted(got)]
    assert order == sorted(order)


def test_pack_plan_doc_window_is_shard_partitioned(spark):
    # the doc-level cumsum window must be partitioned by the shard key
    # (shard-local sort); only the per-shard offset table — one row per
    # shard — may carry an unpartitioned window
    import re

    df = _docs(spark, ["a b c"] * 8)
    plan = pack_contexts(
        df, capacity=4, shard_block=2
    )._jdf.queryExecution().executedPlan().toString()
    wins = re.findall(r"Window \[.*", plan)
    doc_wins = [w for w in wins if "sum(n_tok" in w]
    off_wins = [w for w in wins if "sum(_tot" in w]
    assert doc_wins and off_wins
    for w in doc_wins:  # windowspecdefinition lists partition cols first
        assert "windowspecdefinition(_shard" in w


def test_null_text_emits_one_empty_chunk(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "abcd")], "doc_id long, text string"
    )
    rows = sorted(
        tuple(r) for r in chunk_documents(df, chunk_size=3, overlap=1)
        .collect()
    )
    assert rows == [
        (0, 0, 1, "", 0),
        (1, 0, 1, "abc", 3),
        (1, 1, 3, "cd", 2),
    ]
