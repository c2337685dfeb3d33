"""Unit tests for the training-data pipeline operator modules
(operators/dedup.py, operators/similarity.py, operators/multimodal.py) on
small hand-checkable inputs — complementing the oracle gate which runs them
against DuckDB on the driver testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from l_space_spark.operators import dedup, multimodal, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different content about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (5, "tiny"),  # < 3 tokens → no shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_exact_dedup(docs):
    groups = dedup.exact_dedup_groups(docs, "text").collect()
    assert len(groups) == 1 and groups[0]["n_copies"] == 2
    kept = dedup.keep_first_exact(docs, "doc_id", "text")
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 3, 5}


def test_ngram_jaccard_pairs(docs):
    pairs = {(r["a"], r["b"]) for r in
             dedup.ngram_jaccard_pairs(docs, "doc_id").collect()}
    # exact dup pair always passes; near-dup 1-2 shares 6 of 8 shingles
    # (J = 6/8 ≥ 1/2); doc 3 matches nothing; doc 5 has no shingles
    assert (1, 4) in pairs and (1, 2) in pairs and (2, 4) in pairs
    assert not any(3 in p or 5 in p for p in pairs)


def _brute_jaccard_pairs(rows, j_num, j_den):
    import re

    toks = {r["doc_id"]: set(re.findall(r"[a-z0-9]+", r["text"].lower()))
            for r in rows}
    expect = {}
    # token-less docs never reach the operator's explode/join pipeline —
    # without this skip a pair of empty docs would "pass" (0 ≥ 0) here
    ids = sorted(i for i in toks if toks[i])
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(toks[a] & toks[b])
            if (j_den + j_num) * inter >= j_num * (len(toks[a]) + len(toks[b])):
                expect[(a, b)] = (inter, len(toks[a]), len(toks[b]))
    return expect


def test_prefix_jaccard_pairs(docs):
    # +1 token-less doc: must be silently absent from pairs, not crash
    aug = docs.unionByName(docs.sparkSession.createDataFrame(
        [(6, "!!! ---")], "doc_id long, text string"))
    got = {(r["a"], r["b"]): (r["inter_n"], r["size_a"], r["size_b"])
           for r in dedup.prefix_jaccard_pairs(aug, "doc_id").collect()}
    assert got == _brute_jaccard_pairs(aug.collect(), 1, 2)
    assert not any(6 in p for p in got)


def test_prefix_jaccard_pairs_threshold_two_thirds(spark):
    # a second threshold exercises the ceil-based prefix-length arithmetic;
    # corpus built so some pairs fall between 1/2 and 2/3
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rows = [(i, " ".join(words[j] for j in range(8) if (i >> j) & 1 or j < 3))
            for i in range(1, 17)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["a"], r["b"]): (r["inter_n"], r["size_a"], r["size_b"])
           for r in dedup.prefix_jaccard_pairs(df, "doc_id",
                                               j_num=2, j_den=3).collect()}
    assert got == _brute_jaccard_pairs(df.collect(), 2, 3)


def _brute_shingle_sets(rows, n=3):
    import re

    out = {}
    for r in rows:
        ts = re.findall(r"[a-z0-9]+", r["text"].lower())
        out[r["doc_id"]] = {
            " ".join(ts[i:i + n]) for i in range(len(ts) - n + 1)
        }
    return out


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    """40 docs; 30% share an identical license-header paragraph (a hot
    shingle block with df ≈ 12 — the web-boilerplate regime the prefix
    filter exists for), several engineered near-dup/excerpt pairs."""
    header = ("permission is hereby granted free of charge to any person "
              "obtaining a copy of this software and associated files")
    bodies = []
    for i in range(40):
        uniq = " ".join(f"w{i}x{j} y{(i * 7 + j) % 13}z{j}" for j in range(10))
        text = (header + " " + uniq) if i % 10 < 3 else uniq
        bodies.append((i, text))
    bodies.append((100, bodies[0][1]))          # exact dup of 0
    bodies.append((101, bodies[0][1] + " tail extra words"))   # near-dup
    bodies.append((102, header))                # pure boilerplate
    bodies.append((103, header))                # pure boilerplate dup
    return spark.createDataFrame(
        bodies, "doc_id long, text string").persist()


def test_ngram_jaccard_prefix_lossless_on_boilerplate(boilerplate_docs):
    """The PPJoin prefix filter must be LOSSLESS: identical pairs to a
    brute all-pairs shingle Jaccard on a corpus dominated by one shared
    boilerplate block (the hot-key case the naive inverted index squares
    on)."""
    sets = _brute_shingle_sets(boilerplate_docs.collect())
    ids = sorted(i for i in sets if sets[i])
    expect = set()
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            i = len(sets[a] & sets[b])
            if 3 * i >= len(sets[a]) + len(sets[b]):
                expect.add((a, b))
    got = {(r["a"], r["b"]) for r in dedup.ngram_jaccard_pairs(
        boilerplate_docs, "doc_id").collect()}
    assert got == expect
    assert (0, 100) in got and (102, 103) in got


def test_containment_prefix_lossless_on_boilerplate(boilerplate_docs):
    """Containment's asymmetric prefix filter (min-size overlap bound)
    must reproduce brute-force rows exactly, including the
    excerpt-in-superset direction (pure header contained in header+body)."""
    sets = _brute_shingle_sets(boilerplate_docs.collect())
    ids = sorted(i for i in sets if sets[i])
    expect = {}
    for a in ids:
        for b in ids:
            if a == b:
                continue
            i = len(sets[a] & sets[b])
            if 5 * i >= 3 * len(sets[a]):
                expect[(a, b)] = (i, len(sets[a]))
    got = {(r["a"], r["b"]): (r["common"], r["na"])
           for r in dedup.containment_pairs(
               boilerplate_docs, "doc_id", c_num=3, c_den=5).collect()}
    assert got == expect
    # the excerpt direction really fires: the pure-header doc is
    # ≥3/5-contained in the header-carrying doc 0
    assert (102, 0) in expect and (102, 0) in got


def test_minhash_lsh_recall_on_exact_dups(docs):
    sig = dedup.minhash_signatures(docs, "doc_id")
    rows = {r["id"]: tuple(r[f"h{i}"] for i in range(8)) for r in sig.collect()}
    assert rows[1] == rows[4]  # identical shingle sets ⇒ identical signature
    assert 5 not in rows  # no shingles ⇒ no signature
    cands = {(r["a"], r["b"]) for r in
             dedup.lsh_candidate_pairs(sig).collect()}
    assert (1, 4) in cands  # exact dups always collide in every band


def test_simhash_and_hamming(docs, spark):
    s = dedup.simhash(docs, "doc_id")
    vals = {r["id"]: r["simhash"] for r in s.collect()}
    assert vals[1] == vals[4]  # same token set
    a = spark.createDataFrame([(vals[1], vals[2])], "x long, y long")
    ham_near = a.select(dedup.hamming64(F.col("x"), F.col("y")).alias("h")).first()["h"]
    b = spark.createDataFrame([(vals[1], vals[3])], "x long, y long")
    ham_far = b.select(dedup.hamming64(F.col("x"), F.col("y")).alias("h")).first()["h"]
    assert ham_near < ham_far  # near-dup closer than unrelated doc


@pytest.fixture(scope="module")
def vectors(spark):
    # 3 clusters on axes + one deliberate near-duplicate of id 0
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.98, 0.02, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [0.0, 0.0, 0.97, 0.03]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").persist()


def test_cosine_topk_exact(vectors):
    top1 = {
        r["query_id"]: r["neighbor"]
        for r in similarity.cosine_topk(vectors, k=1).collect()
    }
    assert top1 == {0: 1, 1: 0, 2: 3, 3: 2, 4: 5, 5: 4}


def test_hyperplane_lsh_buckets_group_clusters(vectors):
    got = similarity.hyperplane_lsh_topk(vectors, k=1, bits=4, dims=4).collect()
    top1 = {r["query_id"]: r["neighbor"] for r in got}
    # every query whose true NN shares its bucket must retrieve it
    for q, nn in top1.items():
        assert nn == {0: 1, 1: 0, 2: 3, 3: 2, 4: 5, 5: 4}[q]


def test_with_hyperplane_sketch_matches_inline_form(spark):
    """The broadcast-matrix fold (with_hyperplane_sketch — the scale form,
    VERDICT r2 watch-item #1) must be BIT-IDENTICAL to the inline-literal
    hyperplane_sketch, and its plan must be free of the per-sign md5
    machinery (one broadcast literal matrix instead)."""
    import random

    random.seed(7)
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(100)]
    base = spark.createDataFrame(rows, "id long, v array<double>")
    old = {
        r["id"]: r["b"]
        for r in base.select(
            "id", similarity.hyperplane_sketch(F.col("v"), 6, 16).alias("b")
        ).collect()
    }
    newdf = similarity.with_hyperplane_sketch(base, "v", 6, 16)
    new = {r["id"]: r["bucket"] for r in newdf.select("id", "bucket").collect()}
    assert old == new
    assert len(set(new.values())) > 1  # sketch actually discriminates
    # plan has no md5 (signs precomputed driver-side, shipped as one row)
    plan = newdf._jdf.queryExecution().executedPlan().toString()
    assert "md5" not in plan, plan


def test_multimodal_features(spark):
    media = multimodal.synth_media(spark, n=12)
    feats = multimodal.extract_features(media, feat_dim=8)
    rows = feats.collect()
    assert len(rows) == 12
    assert all(r["ok"] for r in rows)
    assert all(len(r["feat"]) == 8 for r in rows)
    # deterministic: same item → same features across runs
    again = {r["item_id"]: r["feat"] for r in
             multimodal.extract_features(media, feat_dim=8).collect()}
    assert all(again[r["item_id"]] == r["feat"] for r in rows)


def test_multimodal_error_rows_not_failures(spark):
    import pandas as pd

    bad = spark.createDataFrame(
        pd.DataFrame(
            [{"item_id": 1, "modality": "image", "codec": "png", "width": 1,
              "height": 1, "duration_ms": 0, "data": b""}]
        )
    )
    rows = multimodal.extract_features(bad).collect()
    assert len(rows) == 1 and rows[0]["ok"] is False
    assert "empty payload" in rows[0]["error"]


def test_frame_sample(spark):
    media = multimodal.synth_media(spark, n=9)
    frames = multimodal.frame_sample(media, every_ms=200)
    got = frames.groupBy("item_id").count().collect()
    # only video items (item_id % 3 == 2), frames = duration/200 + 1
    assert all(r["item_id"] % 3 == 2 for r in got)
    for r in got:
        assert r["count"] == r["item_id"] * 100 // 200 + 1


def test_ivf_topk_matches_bruteforce_top1(vectors):
    # codebook = ids 0..3 (one per axis cluster + the near-dup of 0);
    # nprobe=2 is enough for every query's true NN cell to be probed
    got = similarity.ivf_topk(vectors, k=1, n_centroids=4, nprobe=2).collect()
    top1 = {r["query_id"]: r["neighbor"] for r in got}
    assert top1 == {0: 1, 1: 0, 2: 3, 3: 2, 4: 5, 5: 4}


def test_ivf_separate_query_batch(vectors):
    qs = vectors.where(F.col("vec_id") < 2)
    got = similarity.ivf_topk(vectors, queries=qs, k=1,
                              n_centroids=4, nprobe=2).collect()
    assert {r["query_id"] for r in got} == {0, 1}
    top1 = {r["query_id"]: r["neighbor"] for r in got}
    assert top1 == {0: 1, 1: 0}


def test_ivf_kmeans_refines_codebook(vectors, spark):
    import numpy as np

    res = similarity.ivf_train_kmeans(spark, vectors, n_centroids=3,
                                      max_iters=5, resume=False)
    cents = {r["cid"]: np.array(r["cv"]) for r in res.state.collect()}
    assert len(cents) == 3
    # centroid shift converged (monotone to below tol)
    assert res.converged and res.deltas[-1] <= 1e-6
    # trained centroids beat the raw seeds: each axis-cluster's centroid
    # should align with its cluster direction (cosine > 0.99)
    mat = np.vstack(list(cents.values()))
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for axis in range(3):
        e = np.zeros(4); e[axis] = 1.0
        assert max(mat @ e) > 0.99, (axis, mat)
    # the refined codebook drops into ivf_topk unchanged
    got = similarity.ivf_topk(vectors, k=1, nprobe=2,
                              codebook=res.state).collect()
    top1 = {r["query_id"]: r["neighbor"] for r in got}
    assert top1 == {0: 1, 1: 0, 2: 3, 3: 2, 4: 5, 5: 4}


def test_ivf_autotune_nprobe(vectors):
    """Autotuning walks nprobe upward and returns the smallest level whose
    sampled recall@k meets the target; probing every cell is exhaustive so
    a 1.0 target is always reachable; the recall curve is monotone."""
    out = similarity.ivf_autotune_nprobe(
        vectors, recall_target=1.0, k=1, n_centroids=4, sample_queries=6
    )
    assert out["recall"] == 1.0
    assert 1 <= out["nprobe"] <= 4
    # monotone curve (recall never drops as nprobe grows)
    ps = sorted(out["curve"])
    assert all(out["curve"][a] <= out["curve"][b]
               for a, b in zip(ps, ps[1:]))
    # a looser target never needs more probes
    loose = similarity.ivf_autotune_nprobe(
        vectors, recall_target=0.5, k=1, n_centroids=4, sample_queries=6
    )
    assert loose["nprobe"] <= out["nprobe"]
    assert loose["recall"] >= 0.5


def test_kmv_sketch_merge_and_accuracy(spark):
    """KMV: merging per-shard partial sketches equals sketching the whole;
    unsaturated groups are exact; saturated estimates land within the
    ~1/sqrt(k) relative-error regime."""
    from l_space_spark.operators import sketch

    # items are 'a'-prefixed ids: group 0 has 1000 distinct, group 1 has
    # 500 (ids folded mod 500), group 2 has 40 (< k → exact). Estimates on
    # a FIXED item set are deterministic draws — these particular sets sit
    # within ~1σ of truth (the raw decimal-string set happened to be a
    # 3.8σ outlier, still matching the pure-python sketch bit-for-bit).
    df = spark.range(0, 3000).select(
        F.pmod("id", F.lit(3)).cast("string").alias("grp"),
        F.concat(
            F.lit("a"),
            F.when(F.pmod("id", F.lit(3)) == 0, F.floor(F.col("id") / 3))
            .when(F.pmod("id", F.lit(3)) == 1,
                  F.pmod(F.floor(F.col("id") / 3), F.lit(500)))
            .otherwise(F.pmod(F.col("id"), F.lit(120))).cast("string"),
        ).alias("item"),
    )
    k = 64
    whole = sketch.kmv_sketch(df, "grp", "item", k=k)
    est = {r["g"]: r["est"] for r in sketch.kmv_estimate(whole, k=k).collect()}
    exact = {r["grp"]: r["n"] for r in df.groupBy("grp").agg(
        F.countDistinct("item").alias("n")).collect()}
    assert est["2"] == exact["2"]  # unsaturated → exact
    for g in ("0", "1"):
        assert abs(est[g] - exact[g]) / exact[g] < 0.3  # ~2σ of 1/sqrt(62)

    # mergeability: shard the input, sketch each shard, merge == whole
    sharded = df.withColumn("shard", F.pmod(F.xxhash64("item"), F.lit(4)))
    parts = [
        sketch.kmv_sketch(
            sharded.where(F.col("shard") == s), "grp", "item", k=k
        )
        for s in range(4)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = sketch.kmv_merge(u, k=k)
    a = {r["g"]: (tuple(r["sketch"]), r["n_kept"]) for r in whole.collect()}
    b = {r["g"]: (tuple(r["sketch"]), r["n_kept"]) for r in merged.collect()}
    assert a == b


def test_exact_substring_coverage(spark):
    rows = [
        # docs 1 and 2 share the 5-token run "a b c d e f" (two
        # overlapping 5-grams: positions 1 and 2 in doc 1) → union covers
        # tokens 1..6 of doc 1 (6 tokens), 2..7 of doc 2
        (1, "a b c d e f x1 y1 z1 w1"),
        (2, "q2 a b c d e f r2 s2 t2"),
        (3, "nothing shared here at all five six seven eight nine"),
        (4, "tiny doc"),  # < k tokens → zero grams, still in output
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in dedup.exact_substring_coverage(
        df, "doc_id", "text", k=5).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["n_dup_grams"] == 2 and out[1]["covered_tokens"] == 6
    assert out[2]["n_dup_grams"] == 2 and out[2]["covered_tokens"] == 6
    assert out[1]["n_tokens"] == 10 and out[1]["dup_coverage"] == 6000
    assert out[3]["n_dup_grams"] == 0 and out[3]["covered_tokens"] == 0
    assert out[3]["dup_coverage"] == 0
    assert out[4]["n_tokens"] == 2 and out[4]["n_dup_grams"] == 0


def test_paragraph_dedup_stats(spark):
    rows = [
        # para_tokens=3: doc 1 = ["a b c", "d e f", "g"]; doc 2 repeats
        # doc 1's first paragraph twice and adds its own; doc 3 is all
        # duplicates of earlier paragraphs → empty survivor text.
        (1, "a b c d e f g"),
        (2, "a b c a b c x y z"),
        (3, "d e f a b c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in dedup.paragraph_dedup_stats(
        df, "doc_id", "text", para_tokens=3).collect()}
    assert out[1]["n_paras"] == 3 and out[1]["n_dup_paras"] == 0
    assert out[1]["kept_tokens"] == 7
    # doc 2: pos 1 "a b c" is a dup of (1,1); pos 2 "a b c" dup too;
    # pos 3 "x y z" is new → 1 kept paragraph of 3 tokens
    assert out[2]["n_paras"] == 3 and out[2]["n_dup_paras"] == 2
    assert out[2]["kept_tokens"] == 3
    # doc 3: both paragraphs seen earlier → nothing survives
    assert out[3]["n_dup_paras"] == 2 and out[3]["kept_tokens"] == 0
    # kept_hash is the portable hash of the reassembled survivor text
    from l_space_spark.functions.text import hash60
    exp = {r["s"]: r["h"] for r in spark.createDataFrame(
        [("a b c d e f g",), ("x y z",), ("",)], "s string"
    ).select("s", hash60(F.col("s")).alias("h")).collect()}
    assert out[1]["kept_hash"] == exp["a b c d e f g"]
    assert out[2]["kept_hash"] == exp["x y z"]
    assert out[3]["kept_hash"] == exp[""]


def test_gopher_quality(spark):
    from l_space_spark.functions.text import gopher_quality

    long_ok = " ".join(
        ["the", "and"] + [f"word{i:02d}" for i in range(40)])
    rows = [
        (1, long_ok),                        # passes all four
        (2, "tiny the and doc"),             # fails r_count only
        (3, " ".join(["the", "and"] + ["spam"] * 40)),  # fails r_rep
        (4, " ".join(["no", "stop", "terms"] * 14)),    # fails r_stop+r_rep
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in gopher_quality(df, "doc_id", "text").collect()}
    assert out[1]["ok"] and out[1]["r_count"] and out[1]["r_rep"]
    assert not out[2]["r_count"] and out[2]["r_stop"] and not out[2]["ok"]
    # doc 3: 42 tokens, "spam" owns 40 -> 5*40 > 42
    assert out[3]["r_count"] and not out[3]["r_rep"] and not out[3]["ok"]
    assert not out[4]["r_stop"] and not out[4]["r_rep"]
    # max-run fold really computes the max frequency, not a prefix run
    one = gopher_quality(
        spark.createDataFrame([(9, "b a b c b a")], "doc_id long, text string"),
        "doc_id", "text").collect()[0]
    # sorted: a a b b b c -> best run 3 = freq of "b"; 5*3 > 6 -> r_rep False
    assert one["n_tokens"] == 6 and not one["r_rep"]


def test_boilerplate_star_edges(spark):
    rows = [
        (1, "a b c x1 y1 z1"),   # shares para "a b c" with 2 and 3
        (2, "a b c x2 y2 z2"),
        (3, "q r s a b c"),      # holds it at a different position
        (4, "unique only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["src"], r["dst"]) for r in dedup.boilerplate_star_edges(
        df, "doc_id", "text", para_tokens=3).collect()}
    # star: owner (min id = 1) -> every other holder; no clique edge 2-3
    assert got == {(1, 2), (1, 3)}


def test_rmat_edges_replica_and_skew(spark):
    import hashlib

    from l_space_spark.operators.rmat import rmat_edges

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def replica(e, scale, pa, pb, pc):
        src = dst = 0
        for b in range(1, scale + 1):
            r = h60(f"rmat:{e}:{b}") % 10000
            src = src * 2 + (1 if r >= pa + pb else 0)
            dst = dst * 2 + (1 if (pa <= r < pa + pb or r >= pa + pb + pc)
                             else 0)
        return src, dst

    ids = spark.range(0, 400).select(F.col("id").alias("e"))
    got = {r["e"]: (r["src"], r["dst"])
           for r in rmat_edges(ids, scale=6).collect()}
    assert len(got) == 400
    for e in (0, 1, 7, 123, 399):
        assert got[e] == replica(e, 6, 5700, 1900, 1900), e
    # skew: quadrant (0,0) dominance concentrates mass on low ids
    assert sum(1 for s, d in got.values() if s < 32) > 250
    import pytest as _pytest
    with _pytest.raises(ValueError, match="sum"):
        rmat_edges(ids, scale=6, probs_e4=(5000, 1000, 1000, 500))


def test_hll_sketch_merge_and_accuracy(spark):
    """HLL: merged per-shard registers equal whole-input registers; the
    raw estimate lands within the ~1.04/sqrt(64)≈13% regime for
    cardinalities well above m (these fixed sets sit within ~2σ)."""
    from l_space_spark.operators import sketch

    df = spark.range(0, 3000).select(
        F.pmod("id", F.lit(2)).cast("string").alias("grp"),
        F.concat(
            F.lit("h"),
            F.when(F.pmod("id", F.lit(2)) == 0, F.floor(F.col("id") / 2))
            .otherwise(F.pmod(F.floor(F.col("id") / 2), F.lit(400)))
            .cast("string"),
        ).alias("item"),
    )
    whole = sketch.hll_registers(df, "grp", "item")
    est = {r["g"]: r["est_e5"] / 1e5
           for r in sketch.hll_estimate(whole).collect()}
    exact = {r["grp"]: r["n"] for r in df.groupBy("grp").agg(
        F.countDistinct("item").alias("n")).collect()}
    for g in ("0", "1"):
        assert abs(est[g] - exact[g]) / exact[g] < 0.27

    sharded = df.withColumn("shard", F.pmod(F.xxhash64("item"), F.lit(4)))
    parts = [
        sketch.hll_registers(
            sharded.where(F.col("shard") == s), "grp", "item"
        )
        for s in range(4)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = sketch.hll_merge(u)
    a = {(r["g"], r["b"]): r["reg"] for r in whole.collect()}
    b = {(r["g"], r["b"]): r["reg"] for r in merged.collect()}
    assert a == b


def test_hll_register_cap_and_window(spark):
    """Registers never exceed RCAP and buckets stay within [0, m)."""
    from l_space_spark.operators import sketch

    df = spark.range(0, 5000).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("item")
    )
    regs = sketch.hll_registers(df, "grp", "item").collect()
    assert all(1 <= r["reg"] <= sketch.HLL_RCAP for r in regs)
    assert all(0 <= r["b"] < sketch.HLL_M for r in regs)


def test_bpe_pair_counts_twin(spark):
    """Weighted adjacent char-pair counts match a python twin."""
    import re
    from collections import Counter

    from l_space_spark.functions.text import bpe_pair_counts

    texts = ["the cat sat on the mat", "a cat! A CAT sat", "banana bandana"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r["pair"]: r["weight"]
           for r in bpe_pair_counts(df, "text").collect()}
    words = Counter(
        w for t in texts for w in re.findall("[a-z0-9]+", t.lower())
    )
    want = Counter()
    for w, cnt in words.items():
        for i in range(len(w) - 1):
            want[w[i:i + 2]] += cnt
    assert got == dict(want)
    assert got["at"] == words["cat"] + words["sat"] + words["mat"]


def test_lm_familiarity_twin(spark):
    """Mean corpus bigram frequency at 1e-6 fixed point, half-up."""
    import re
    from collections import Counter

    from l_space_spark.functions.text import lm_familiarity

    texts = [(1, "the cat sat"), (2, "the cat ran"), (3, "zq"), (4, "x")]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["id"]: (r["n_bigrams"], r["lm_score_e6"])
           for r in lm_familiarity(df, "doc_id", "text").collect()}

    def bigrams(t):
        ts = re.findall("[a-z0-9]+", t.lower())
        return [f"{a} {b}" for a, b in zip(ts, ts[1:])]

    corpus = Counter(g for _, t in texts for g in bigrams(t))
    want = {}
    for i, t in texts:
        bs = bigrams(t)
        if bs:
            s, nb = sum(corpus[g] for g in bs), len(bs)
            want[i] = (nb, (s * 2_000_000 + nb) // (2 * nb))
    assert got == want
    assert 3 not in got and 4 not in got  # <2 tokens -> no bigram row
    assert got[1][1] > 1_000_000  # 'the cat' seen twice -> mean > 1
