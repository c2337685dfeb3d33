#!/usr/bin/env python
"""Candidate-bound probe for the SHINGLE-level prefix filter
(ngram_jaccard_pairs / containment_pairs after the round-5 PPJoin fix).

The boilerplate case the round-4 verdict flagged: a license-header
paragraph shared by a large fraction of documents puts a block of HOT
shingles (df ≈ boilerplate_docs) into every carrier.  The naive
inverted-index self-join fans each hot shingle out to O(df²) joined rows
before any aggregation can help; the prefix filter orders shingles by
ascending global df and indexes only each document's rarest
``n − ⌈t·n⌉ + 1``, so the hot block never enters the candidate join
(it is prefix-indexed only by documents that are almost nothing but
boilerplate).

Corpus: every doc = 19-token license header (shared by --boiler-pct %
of each 100-block, decided on the PAIR seed so a planted dup and its
twin always agree) + 20 doc-unique tokens; docs (100k, 100k+1)
duplicate each other's unique tail → n/100 planted J=1 pairs.
Reported per rung:

- ``naive_joined_rows``  Σ df² fan-out of the unfiltered g-self-join
  (the rows the old plan's groupBy had to absorb)
- ``naive_cand_pairs``   distinct co-occurring pairs (old verify input)
- ``prefix_cand_pairs``  distinct prefix-filter candidates (new verify
  input) — the bounded quantity
- final pair counts from the public operator, asserted equal to the
  planted count (losslessness is separately brute-checked in
  tests/test_pipeline_ops.py on an adversarial fixture)

Usage: python bench_ngram_prefix_probe.py [--small 4000] [--big 40000]
Writes BENCH/ngram_prefix_candidates.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from l_space_spark.operators.dedup import (  # noqa: E402
    jaccard_prefix_candidates, ngram_jaccard_pairs, shingle_index,
)
from l_space_spark.session import get_spark  # noqa: E402

HEADER = ("permission is hereby granted free of charge to any person "
          "obtaining a copy of this software and associated files")


def synth_docs(spark, n_docs: int, parts: int, boiler_pct: int):
    """Unique 20-token tail per doc (shared across each planted dup pair
    (100k, 100k+1)); the first boiler_pct% of every 100-block carries the
    shared license header."""
    seed = F.when(
        F.pmod(F.col("id"), F.lit(100)) < 2,
        F.col("id") - F.pmod(F.col("id"), F.lit(2)),
    ).otherwise(F.col("id"))
    uniq = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(20)),
            lambda j: F.concat(
                F.lit("u"),
                F.pmod(F.xxhash64(seed.cast("string"), j),
                       F.lit(1 << 40)).cast("string"),
            ),
        ),
        " ",
    )
    # header membership keyed on the PAIR seed, not the raw id: a
    # planted dup (100k) and its twin (100k+1) must agree, or at
    # --boiler-pct 1 the twin would lack the header and the pair's
    # Jaccard would drop below 1/2 (probe assertion failure)
    text = F.when(
        F.pmod(seed, F.lit(100)) < F.lit(boiler_pct),
        F.concat(F.lit(HEADER + " "), uniq),
    ).otherwise(uniq)
    return spark.range(0, n_docs, 1, parts).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=4_000)
    ap.add_argument("--big", type=int, default=40_000)
    ap.add_argument("--boiler-pct", type=int, default=30)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()
    parts = 16
    spark = get_spark(app_name="ngram-prefix-probe", cores=args.cores,
                      shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cores": args.cores, "parts": parts,
                 "boiler_pct": args.boiler_pct}

    for label, n in (("small", args.small), ("big", args.big)):
        docs = synth_docs(spark, n, parts, args.boiler_pct).persist()
        docs.count()
        ex = shingle_index(docs, "doc_id", "text", 3).persist()
        ex.count()

        # naive fan-out: Σ df² over shingles, computed without running the
        # quadratic join itself (exact row count of ex ⋈_g ex with a<b)
        dfs = ex.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
        joined_rows = dfs.select(
            F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("s")
        ).collect()[0]["s"]
        rung = {"docs": n, "naive_joined_rows": int(joined_rows)}

        if label == "small":
            t0 = time.time()
            rung["naive_cand_pairs"] = (
                ex.select(F.col("id").alias("a"), "g")
                .join(ex.select(F.col("id").alias("b"), "g"), "g")
                .where(F.col("a") < F.col("b"))
                .select("a", "b").distinct().count()
            )
            rung["naive_cand_wall_s"] = round(time.time() - t0, 2)

        # prefix-filtered candidates: the EXACT production generation
        # stage (exported from dedup.py so this probe cannot drift from
        # the operator's plan), j = 1/2
        t0 = time.time()
        rung["prefix_cand_pairs"] = (
            jaccard_prefix_candidates(ex, 1, 2).count()
        )
        rung["prefix_cand_wall_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        final = ngram_jaccard_pairs(docs, "doc_id").count()
        rung["final_pairs"] = final
        rung["final_wall_s"] = round(time.time() - t0, 2)
        planted = len(range(0, n - 1, 100))
        assert final == planted, (final, planted)
        ex.unpersist()
        docs.unpersist()
        out[label] = rung

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/ngram_prefix_candidates.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
