"""Fixed-round integer k-means vs an exact python twin, plus the tf-idf
top-terms ranking vs a hand corpus — both ends of the exactness contract
(quantize once, BIGINT thereafter / rational idf, total-order ranks)."""

import math
import random
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from l_space_spark.functions.text import tfidf_top_terms
from l_space_spark.operators.clustering import (
    cluster_sizes,
    kmeans_fixed,
    quantize_vectors,
)


def vdf(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def tdiv(a, b):
    """Truncate-toward-zero integer division (Spark div / DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def kmeans_twin(vecs, k, iters):
    """Python twin of kmeans_fixed: same quantization, same integer ops,
    same (dist, c) argmin tie-break, same truncating mean."""
    # float32 storage round-trip: quantize the float32 value as double
    import numpy as np

    pts = {
        i: [math.floor(float(np.float32(x)) * 1e6) for x in v]
        for i, v in enumerate(vecs)
    }
    cents = {c: pts[c][:] for c in sorted(pts)[:k]}
    assign = {}
    for t in range(iters):
        assign = {}
        for i, v in pts.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, cv)), c)
                for c, cv in cents.items()
            )
            assign[i] = (best[1], best[0])
        if t < iters - 1:
            sums = defaultdict(lambda: [0] * len(next(iter(pts.values()))))
            ns = Counter()
            for i, (c, _) in assign.items():
                ns[c] += 1
                for j, x in enumerate(pts[i]):
                    sums[c][j] += x
            cents = {
                c: [tdiv(2 * s + ns[c], 2 * ns[c]) for s in sums[c]]
                for c in sums
            }
    return {i: c for i, (c, _) in assign.items()}, {
        i: d for i, (_, d) in assign.items()
    }


def test_two_obvious_blobs(spark):
    # ids 0 and 1 are the seeds — one per blob
    vecs = [[0.0, 0.1], [5.0, 5.1], [0.1, 0.0], [5.1, 5.0], [0.05, 0.05],
            [5.05, 5.05]]
    got = {r["vec_id"]: r["cluster"]
           for r in kmeans_fixed(vdf(spark, vecs), k=2, iters=2).collect()}
    assert got[0] == got[2] == got[4] == 0
    assert got[1] == got[3] == got[5] == 1


def test_matches_python_twin(spark):
    rng = random.Random(3)
    vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(40)]
    df = vdf(spark, vecs)
    got = {r["vec_id"]: (r["cluster"], r["dist2"])
           for r in kmeans_fixed(df, k=4, iters=3).collect()}
    want_c, want_d = kmeans_twin(vecs, 4, 3)
    assert {i: c for i, (c, _) in got.items()} == want_c
    assert {i: d for i, (_, d) in got.items()} == want_d


def test_single_iter_is_seed_assignment(spark):
    vecs = [[float(i), 0.0] for i in range(6)]
    got = {r["vec_id"]: r["cluster"]
           for r in kmeans_fixed(vdf(spark, vecs), k=2, iters=1).collect()}
    # seeds are ids 0 and 1; nearest-seed with (dist, c) tie-break
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_cluster_sizes_census(spark):
    vecs = [[0.0], [9.0], [0.0], [9.0]]  # seeds (ids 0, 1) one per blob
    sizes = cluster_sizes(
        kmeans_fixed(vdf(spark, vecs), k=2, iters=2)
    ).collect()
    assert [(r["cluster"], r["n"]) for r in sizes] == [(0, 2), (1, 2)]
    # clusters carry the SEED id (0 and 1), members are {0,2} and {1,3}
    assert all(r["mean_dist2"] == 0 for r in sizes)


def test_quantize_is_floor_e6(spark):
    import numpy as np

    vals = [0.1234567, -0.9999999, 1.5]
    out = quantize_vectors(
        vdf(spark, [vals]), "vec_id", "embedding"
    ).collect()[0]["v"]
    assert out == [math.floor(float(np.float32(x)) * 1e6) for x in vals]


# ---- tf-idf top terms -------------------------------------------------------


def ddf(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_tfidf_rare_term_outranks_common(spark):
    texts = [
        "alpha alpha beta", "alpha beta beta", "alpha zebra",
    ]
    out = tfidf_top_terms(ddf(spark, texts), "doc_id", "text", top_k=1)
    top = {r["doc_id"]: r["term"] for r in out.collect()}
    # doc2: zebra (tf=1, df=1 → score 3e6) beats alpha (tf=1, df=3 → 1e6)
    assert top[2] == "zebra"
    # doc0: alpha tf=2 df=3 → 2e6; beta tf=1 df=2 → 1.5e6 → tf wins
    assert top[0] == "alpha"


def test_tfidf_exact_scores_and_ranks(spark):
    texts = ["a a b c", "b c c", "a d"]
    rows = tfidf_top_terms(ddf(spark, texts), "doc_id", "text", top_k=10)
    got = {(r["doc_id"], r["term"]): (r["tf"], r["doc_freq"], r["score_e6"],
                                      r["rnk"]) for r in rows.collect()}
    n = 3
    # twin: score = (2*tf*1e6*n + df) // (2*df); ranks by (score desc, term)
    tf = Counter()
    for i, t in enumerate(texts):
        for w in t.split():
            tf[(i, w)] += 1
    df = Counter(w for (_, w) in tf)
    want = {}
    per_doc = defaultdict(list)
    for (i, w), f in tf.items():
        s = (2 * f * 1000000 * n + df[w]) // (2 * df[w])
        per_doc[i].append((-s, w, f))
    for i, lst in per_doc.items():
        for rnk, (neg_s, w, f) in enumerate(sorted(lst), 1):
            want[(i, w)] = (f, df[w], -neg_s, rnk)
    assert got == want


def test_tfidf_empty_docs_ignored(spark):
    rows = tfidf_top_terms(
        ddf(spark, ["", "only words here"]), "doc_id", "text"
    ).collect()
    assert {r["doc_id"] for r in rows} == {1}
