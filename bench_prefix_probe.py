#!/usr/bin/env python
"""Scale probe for prefix_jaccard_pairs (PPJoin-family prefix filtering).

The case prefix filtering exists for: every document shares a handful of
HOT boilerplate tokens.  A naive token-level inverted index joins on
those hot tokens, so its candidate set is Θ(hot · n²) regardless of how
few pairs are actually similar.  The prefix filter orders each document's
tokens by ascending global df and indexes only the rarest
``n − ⌈t·n⌉ + 1``, so hot tokens never enter the join and candidates come
only from genuinely-shared rare tokens.

Corpus: each doc = 20 doc-unique rare tokens + 10 boilerplate tokens
present in EVERY doc (J across cohorts = 10/50 = 0.2 < 1/2); docs
(100k, 100k+1) share their rare tokens → n/100 planted pairs with J = 1.

- naive inverted index at n docs: candidates ≈ 10·C(n,2) → quadratic;
  run only at the small rung to demonstrate the blowup.
- prefix filter at the same n and at 40×: near-linear, exact same pairs.

Usage: python bench_prefix_probe.py [--small 5000] [--big 200000]
Writes BENCH/prefix_jaccard_probe.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from l_space_spark.operators.dedup import prefix_jaccard_pairs  # noqa: E402
from l_space_spark.session import get_spark  # noqa: E402


def synth_docs(spark, n_docs: int, parts: int):
    """20 rare tokens (shared between doc 100k and 100k+1) + 10 hot
    boilerplate tokens per doc."""
    seed = F.when(
        F.pmod(F.col("id"), F.lit(100)) < 2, F.col("id") - F.pmod(F.col("id"), F.lit(2))
    ).otherwise(F.col("id"))
    rare = F.transform(
        F.sequence(F.lit(1), F.lit(20)),
        lambda j: F.concat(
            F.lit("u"),
            F.pmod(F.xxhash64(seed.cast("string"), j), F.lit(1 << 40)).cast("string"),
        ),
    )
    hot = F.transform(
        F.sequence(F.lit(1), F.lit(10)),
        lambda j: F.concat(F.lit("b"), j.cast("string")),
    )
    return spark.range(0, n_docs, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.array_join(F.concat(rare, hot), " ").alias("text"),
    )


def naive_pairs(docs):
    """Token-level inverted index WITHOUT prefix filtering — the
    comparison baseline whose candidate set is hot-token-quadratic."""
    from l_space_spark.functions.text import tokens

    ts = docs.select(
        F.col("doc_id").alias("id"), F.explode(tokens(F.col("text"))).alias("t")
    ).distinct()
    sizes = ts.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        ts.select(F.col("id").alias("a"), "t")
        .join(ts.select(F.col("id").alias("b"), "t"), "t")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter_n"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("n").alias("size_a")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("n").alias("size_b")), "b")
        .where(F.lit(3) * F.col("inter_n") >= F.col("size_a") + F.col("size_b"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=5_000)
    ap.add_argument("--big", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()
    parts = 16
    spark = get_spark(app_name="prefix-jaccard-probe", cores=args.cores,
                      shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cores": args.cores, "parts": parts}

    for label, n in (("small", args.small), ("big", args.big)):
        docs = synth_docs(spark, n, parts).persist()
        docs.count()
        t0 = time.time()
        np_ = prefix_jaccard_pairs(docs, "doc_id").count()
        out[f"prefix_{label}"] = {
            "docs": n, "pairs": np_, "wall_s": round(time.time() - t0, 2),
        }
        # planted pairs are (100k, 100k+1) for every 100k+1 < n
        assert np_ == len(range(0, n - 1, 100)), (np_, n)
        if label == "small":
            t0 = time.time()
            nn = naive_pairs(docs).count()
            out["naive_small"] = {
                "docs": n, "pairs": nn, "wall_s": round(time.time() - t0, 2),
            }
            assert nn == np_, (nn, np_)
        docs.unpersist()

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/prefix_jaccard_probe.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
