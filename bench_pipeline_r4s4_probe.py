#!/usr/bin/env python
"""Scale probe for the session's training-pipeline + GNN-sampling ops.

Evidence that the new plans survive 100×, at 200k docs / 1M-vertex
8M-edge power-law graphs on local[8]:

- exact_substring_coverage / paragraph_dedup_stats: gram and paragraph
  instances travel as 60-bit hashes; the only wide shuffles are one
  combiner-backed groupBy on the hash plus one equi-join back; the
  per-document windows/collects are bounded by document length.
- khop_fanout_sample: per hop one equi-join of a (seeds × frontier)
  table against the src-partitioned adjacency, capped per parent by the
  two-level sharded rank — a celebrity hub's adjacency never lands in
  one sort task.
- negative_samples: the inverted-CDF lookup is an equi-join on the
  block key; a hub owning 25% of the weight line owns 25% of the block
  KEYS, not one hot key.
- neighbor_feature_sums: one equi-join + one groupBy with per-dim sums;
  map-side partial aggregation shrinks a hub's in-edges before shuffle.

Usage: python bench_pipeline_r4s4_probe.py [--docs 200000] [--cores 8]
Writes BENCH/pipeline_r4s4_probe.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bench_scaling import synth_powerlaw_edges  # noqa: E402
from l_space_spark.operators.dedup import (  # noqa: E402
    exact_substring_coverage,
    paragraph_dedup_stats,
)
from l_space_spark.operators.sage import (  # noqa: E402
    khop_fanout_sample,
    neighbor_feature_sums,
)
from l_space_spark.operators.sampling import negative_samples  # noqa: E402
from l_space_spark.session import get_spark  # noqa: E402


def synth_docs(spark, n_docs: int, parts: int, doc_tokens: int = 60):
    """1/5 of docs share a verbatim 15-token boilerplate run at
    positions 21..35; everything else is hash-unique."""
    tok = lambda j: F.when(  # noqa: E731
        (F.col("id") % 5 == 0) & j.between(21, 35),
        F.concat(F.lit("b"), j.cast("string")),
    ).otherwise(
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64("id", j), F.lit(1 << 40)).cast("string"),
        )
    )
    return spark.range(0, n_docs, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.transform(F.sequence(F.lit(1), F.lit(doc_tokens)), tok)
        ).alias("text"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()
    parts = 16
    spark = get_spark(app_name="pipeline-r4s4-probe", cores=args.cores,
                      shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"docs": args.docs, "cores": args.cores}

    docs = synth_docs(spark, args.docs, parts).persist()
    docs.count()

    t0 = time.time()
    r = exact_substring_coverage(docs, "doc_id", "text", k=5)
    n_dup = r.where(F.col("n_dup_grams") > 0).count()
    out["exact_substring"] = {
        "wall_s": round(time.time() - t0, 2), "docs_with_dups": n_dup,
    }

    t0 = time.time()
    p = paragraph_dedup_stats(docs, "doc_id", "text", para_tokens=8)
    agg = p.agg(
        F.sum("n_dup_paras").alias("dropped"),
        F.sum("kept_tokens").alias("kept"),
    ).collect()[0]
    out["paragraph_dedup"] = {
        "wall_s": round(time.time() - t0, 2),
        "dropped_paras": int(agg["dropped"]), "kept_tokens": int(agg["kept"]),
    }
    docs.unpersist()

    edges = synth_powerlaw_edges(spark, 8_000_000, 1_000_000, parts).persist()
    n_e = edges.count()
    out["graph"] = {"edges": n_e, "vertices": 1_000_000}

    seeds = spark.range(0, 1000).select(F.col("id").alias("seed"))
    t0 = time.time()
    kh = khop_fanout_sample(spark, edges, seeds, fanouts=(10, 5),
                            num_partitions=parts)
    n_kh = kh.count()
    out["khop_sample"] = {
        "wall_s": round(time.time() - t0, 2), "sampled_edges": n_kh,
        "seeds": 1000, "fanouts": [10, 5],
    }

    t0 = time.time()
    degs = edges.select(F.col("src").alias("id")).unionByName(
        edges.select(F.col("dst").alias("id"))
    ).groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("w"))
    # 1/8 hash filter, NOT limit(): a global limit funnels the pair
    # table through one partition (measured 21.5 s vs 8.2 s)
    pairs = edges.where(
        F.pmod(F.xxhash64("src", "dst"), F.lit(8)) == 0
    ).select(F.col("src").alias("center"), F.col("dst").alias("context"))
    neg = negative_samples(spark, pairs, degs, k=2)
    n_neg = neg.count()
    out["negative_samples"] = {
        "wall_s": round(time.time() - t0, 2), "draws": n_neg,
    }

    feats = spark.range(0, 1_000_000, 1, parts).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda j: (F.pmod(F.xxhash64("id", j), F.lit(1000)) / 500.0 - 1.0)
            .cast("float"),
        ).alias("vec"),
    )
    t0 = time.time()
    nf = neighbor_feature_sums(
        edges.where(F.pmod(F.xxhash64("src", "dst"), F.lit(4)) == 0),
        feats, dim=16,
    )
    n_nf = nf.count()
    out["neighbor_feature_sums"] = {
        "wall_s": round(time.time() - t0, 2), "vertices_out": n_nf, "dim": 16,
    }

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/pipeline_r4s4_probe.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
