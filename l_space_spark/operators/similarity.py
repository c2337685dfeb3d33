"""Similarity search over embedding columns (``array<float>``).

Two tiers, mirroring how a 100 TB pipeline actually runs ANN:

- **brute-force cosine top-k** (`cosine_topk`) — the exact baseline:
  queries × corpus equi-free join, dot product via ``zip_with``/``aggregate``
  (JVM-side higher-order functions, no UDF), ranked per query with
  similarity quantized to 1e-6 before ordering so fp summation order can
  never flip a rank (ties break by neighbor id). O(Q·N·d) — correct at any
  scale where Q is small, and the verifier for the bucketed tier.
- **random-hyperplane LSH ANN** (`hyperplane_lsh_topk`) — the scale tier:
  each vector gets a ``bits``-bit sign sketch (hyperplane directions are
  ±1 per (bit, dim), derived from the portable 60-bit hash so the sketch is
  reproducible in SQL); candidates = bucket equi-join on the sketch prefix,
  then exact cosine rerank within buckets. Shuffle is O(N) on bucket keys —
  no cartesian product anywhere.

- **IVF coarse-quantized ANN** (`ivf_topk`) — the inverted-file tier:
  a deterministic training-free codebook (the ``n_centroids`` lowest-id
  vectors; `ivf_train_kmeans` refines it with Lloyd's iterations on the
  superstep runner), every
  vector assigned to its nearest centroid cell (one pass against a
  broadcast-sized codebook), queries probe their ``nprobe`` nearest cells
  and rerank exactly inside them. Candidate generation is an equi-join on
  ``cell`` — shuffle O(N·nprobe/n_centroids) per query batch, no cartesian
  product, and the cell assignment is reusable across query batches
  (persist it once, probe many times).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import hash60


def as_double_vec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def l2_norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 6,
) -> DataFrame:
    """(query_id, neighbor, rnk) exact top-k by cosine similarity.

    ``queries`` defaults to the corpus itself (self-join, excluding self).
    """
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor"), as_double_vec(F.col(vec_col)).alias("cv")
    ).withColumn("cn", l2_norm(F.col("cv")))
    qs = (queries if queries is not None else embeddings).select(
        F.col(id_col).alias("query_id"), as_double_vec(F.col(vec_col)).alias("qv")
    ).withColumn("qn", l2_norm(F.col("qv")))
    sims = qs.join(corpus, F.col("neighbor") != F.col("query_id")).select(
        "query_id", "neighbor",
        F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                quantize).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor", F.col("rnk").cast("long").alias("rnk"))
    )


def hyperplane_sketch(vec: Column, bits: int, dims: int) -> Column:
    """``bits``-bit sign sketch: bit j = [Σ_i s(j,i)·v_i > 0] where
    s(j,i) ∈ {−1,+1} comes from the portable hash of "j:i" — deterministic,
    data-independent, reproducible in SQL.

    INLINE-LITERAL FORM — builds ``bits × dims`` expression nodes, so it is
    strictly for oracle-parity-sized sketches (the catalog's 6×64). At
    production shapes (768-4096 dims, 32-64 bits) the expression tree alone
    blows up Catalyst analysis; use ``with_hyperplane_sketch`` (broadcast
    sign matrix + one compact fold — same values, flat analysis time,
    measured in BENCH/hyperplane_sketch_ab.json)."""
    def bit(j: int) -> Column:
        signs = F.array(*[
            F.when(hash60(F.lit(f"{j}:{i}")) % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
            for i in range(dims)
        ])
        proj = F.aggregate(F.zip_with(vec, signs, lambda x, s: x * s),
                           F.lit(0.0), lambda a, x: a + x)
        return F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))

    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.shiftleft(bit(j), j)
    return out


def hyperplane_signs(bits: int, dims: int) -> list[list[float]]:
    """Driver-side replica of the hash-derived sign matrix: s(j,i) = +1 if
    the portable 60-bit hash (int of the first 15 hex chars of md5) of
    "j:i" is even — bit-identical to ``hash60`` (functions/text.py), so
    both sketch forms and the inlined-signs SQL oracle agree exactly."""
    import hashlib

    def s(j: int, i: int) -> float:
        h = int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:15], 16)
        return 1.0 if h % 2 == 0 else -1.0

    return [[s(j, i) for i in range(dims)] for j in range(bits)]


def with_hyperplane_sketch(
    df: DataFrame, vec_col: str, bits: int, dims: int,
    out_col: str = "bucket",
) -> DataFrame:
    """``df`` + a ``bits``-bit sign-sketch column — the SCALE form of
    ``hyperplane_sketch`` (VERDICT r2 watch-item #1): the sign matrix is
    computed once driver-side, shipped as ONE broadcast one-row table
    (array<array<double>>, ~8·bits·dims bytes), and the sketch is a single
    compact fold over it — projections via ``transform``/``zip_with``, bit
    packing via a reverse fold (acc·2 + sign bit ≡ Σ bit_j·2^j). Expression
    size is O(1) in bits×dims, so Catalyst analysis stays flat at
    production shapes (dims 768-4096, bits 32-64) where the inline form
    builds ~10⁵-10⁶ nodes. Values are bit-identical to the inline form
    (asserted in tests) — the SQL oracle keeps its inlined-signs text."""
    spark = df.sparkSession
    m = spark.createDataFrame(
        [(hyperplane_signs(bits, dims),)], "__signs: array<array<double>>"
    )
    vec = F.col(vec_col)
    projs = F.transform(F.col("__signs"), lambda row: dot(vec, row))
    one, zero = F.lit(1).cast("long"), F.lit(0).cast("long")
    bucket = F.aggregate(
        F.reverse(projs), zero,
        lambda acc, p: acc * 2 + F.when(p > 0, one).otherwise(zero),
    )
    return (
        df.crossJoin(F.broadcast(m))
        .withColumn(out_col, bucket)
        .drop("__signs")
    )


def hyperplane_lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    bits: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 6,
) -> DataFrame:
    """(query_id, neighbor, rnk) approximate top-k: candidates share the
    ``bits``-bit hyperplane bucket; exact cosine rerank within the bucket."""
    base = with_hyperplane_sketch(
        embeddings.select(
            F.col(id_col).alias("id"), as_double_vec(F.col(vec_col)).alias("v")
        ).withColumn("nrm", l2_norm(F.col("v"))),
        "v", bits, dims,
    ).persist()
    a = base.select(F.col("id").alias("query_id"), F.col("v").alias("qv"),
                    F.col("nrm").alias("qn"), "bucket")
    b = base.select(F.col("id").alias("neighbor"), F.col("v").alias("cv"),
                    F.col("nrm").alias("cn"), "bucket")
    sims = a.join(b, "bucket").where(F.col("neighbor") != F.col("query_id")).select(
        "query_id", "neighbor",
        F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                quantize).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor", F.col("rnk").cast("long").alias("rnk"))
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.995,
    bits: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 6,
) -> DataFrame:
    """(a, b, sim) — near-duplicate vector pairs with quantized cosine ≥
    ``threshold``, candidates restricted to the same hyperplane LSH bucket.

    The embedding-space sibling of MinHash-LSH text dedup: candidate
    generation is a bucket EQUI-join over (id, bucket) PAIRS ONLY — the
    wide vectors rejoin on the (far smaller) candidate set for the exact
    cosine verify, so the candidate shuffle is 16-byte rows. Near-dup
    vectors agree on almost every hyperplane sign, so recall at high
    thresholds stays high as ``bits`` grows.

    SIZE ``bits`` TO THE CORPUS: expected random-collision candidates ≈
    N²/2^bits (2^bits buckets), so pick ``bits ≳ 2·log2(N) − log2(budget)``
    — e.g. 64 bits for 10⁹ docs keeps random collisions ~N; the catalog's
    ANN_BITS=6 suits only its 10³-doc corpus. The sketch is hash-derived
    and data-independent, so the catalog carries an exact SQL oracle for
    this approximate index (inlined sign literals, queries.py)."""
    plain = embeddings.select(
        F.col(id_col).alias("id"), as_double_vec(F.col(vec_col)).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    # only the candidate-generation side pays the sketch computation; the
    # verify sides carry vectors without re-deriving buckets
    ids = with_hyperplane_sketch(plain, "v", bits, dims).select("id", "bucket")
    cand = (
        ids.select(F.col("id").alias("a"), "bucket")
        .join(ids.select(F.col("id").alias("b"), "bucket"), "bucket")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    va = plain.select(F.col("id").alias("a"), F.col("v").alias("av"),
                      F.col("nrm").alias("an"))
    vb = plain.select(F.col("id").alias("b"), F.col("v").alias("bv"),
                      F.col("nrm").alias("bn"))
    return (
        cand.join(va, "a").join(vb, "b")
        .select(
            "a", "b",
            F.round(dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")),
                    quantize).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def _vec_base(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), as_double_vec(F.col(vec_col)).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))


def _ivf_assign(base: DataFrame, cents: DataFrame, nprobe: int,
                quantize: int) -> DataFrame:
    """(id, v, nrm, cell, probe_rnk) — each vector's ``nprobe`` nearest
    codebook cells by quantized cosine (ties break by centroid id). The
    codebook is broadcast (tiny by construction), so assignment is a
    map-side cross product — no shuffle of the corpus."""
    sim = F.round(dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")),
                  quantize)
    w = Window.partitionBy("id").orderBy(F.col("csim").desc(), F.col("cid"))
    return (
        base.join(F.broadcast(cents))
        .withColumn("csim", sim)
        .withColumn("probe_rnk", F.row_number().over(w))
        .where(F.col("probe_rnk") <= nprobe)
        .select("id", "v", "nrm", F.col("cid").alias("cell"), "probe_rnk")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 6,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """(query_id, neighbor, rnk) IVF approximate top-k.

    Default codebook = the ``n_centroids`` lowest-id corpus vectors:
    deterministic and training-free, so the assignment is reproducible in
    plain SQL (the oracle requirement). Pass ``codebook=(cid, cv)`` — e.g.
    ``ivf_train_kmeans(...).state`` — to swap in refined centroids without
    changing the assign/probe/rerank plan. Corpus vectors live in their
    single nearest cell; each query probes its ``nprobe`` nearest cells
    and reranks exactly within them.
    """
    base = _vec_base(embeddings, id_col, vec_col)
    if codebook is not None:
        cents = codebook.select("cid", "cv").withColumn(
            "cnrm", l2_norm(F.col("cv"))
        )
    else:
        cents = base.orderBy("id").limit(n_centroids).select(
            F.col("id").alias("cid"), F.col("v").alias("cv"),
            F.col("nrm").alias("cnrm"),
        )
    corpus = _ivf_assign(base, cents, nprobe=1, quantize=quantize).select(
        F.col("id").alias("neighbor"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), "cell"
    )
    qbase = base if queries is None else _vec_base(queries, id_col, vec_col)
    probes = _ivf_assign(qbase, cents, nprobe=nprobe, quantize=quantize).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), "cell"
    )
    sims = probes.join(corpus, "cell").where(
        F.col("neighbor") != F.col("query_id")
    ).select(
        "query_id", "neighbor",
        F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                quantize).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor", F.col("rnk").cast("long").alias("rnk"))
    )


def ivf_recall_at_k(
    embeddings: DataFrame,
    nprobe: int,
    k: int = 5,
    n_centroids: int = 8,
    sample_queries: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
    truth: DataFrame | None = None,
) -> float:
    """Recall@k of the IVF index vs exact brute force, on a deterministic
    query sample (the ``sample_queries`` lowest-id vectors — reproducible,
    no RNG). Cost: sample × corpus for the ground truth (bounded by the
    sample size, the standard index-evaluation pattern) + one probed
    search; the corpus is never all-pairs joined. ``truth`` lets callers
    evaluating several nprobe levels compute the (nprobe-independent)
    ground truth once."""
    qs = embeddings.orderBy(id_col).limit(sample_queries)
    if truth is None:
        truth = cosine_topk(embeddings, queries=qs, k=k,
                            id_col=id_col, vec_col=vec_col)
    approx = ivf_topk(embeddings, queries=qs, k=k, n_centroids=n_centroids,
                      nprobe=nprobe, id_col=id_col, vec_col=vec_col,
                      codebook=codebook)
    t = truth.select("query_id", "neighbor")
    hit = t.join(approx.select("query_id", "neighbor"),
                 ["query_id", "neighbor"], "left_semi").count()
    total = t.count()
    return hit / total if total else 1.0


def ivf_autotune_nprobe(
    embeddings: DataFrame,
    recall_target: float = 0.9,
    k: int = 5,
    n_centroids: int = 8,
    sample_queries: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
) -> dict:
    """Smallest ``nprobe`` whose sampled recall@k meets ``recall_target``.

    Walks nprobe upward (recall is monotone non-decreasing in nprobe: a
    larger probe set is a superset of candidates) and stops at the first
    level meeting the target — at most ``n_centroids`` sampled evaluations,
    each bounded by the query sample. Returns ``{"nprobe", "recall",
    "curve"}`` where curve maps each evaluated nprobe to its recall;
    ``nprobe = n_centroids`` (probe everything) is exhaustive and therefore
    always meets any target ≤ 1.0."""
    base = embeddings.persist()
    try:
        # ground truth is nprobe-independent — compute the expensive
        # sample × corpus exact top-k ONCE, reuse across the walk
        qs = base.orderBy(id_col).limit(sample_queries)
        truth = cosine_topk(base, queries=qs, k=k,
                            id_col=id_col, vec_col=vec_col).persist()
        truth.count()
        curve: dict[int, float] = {}
        chosen = n_centroids
        for p in range(1, n_centroids + 1):
            r = ivf_recall_at_k(base, p, k=k, n_centroids=n_centroids,
                                sample_queries=sample_queries, id_col=id_col,
                                vec_col=vec_col, codebook=codebook,
                                truth=truth)
            curve[p] = r
            if r >= recall_target:
                chosen = p
                break
        truth.unpersist()
        return {"nprobe": chosen, "recall": curve[chosen], "curve": curve}
    finally:
        base.unpersist()


def ivf_train_kmeans(
    spark,
    embeddings: DataFrame,
    n_centroids: int = 8,
    max_iters: int = 5,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 6,
    checkpoint_dir: str | None = None,
    resume: bool = True,
):
    """Lloyd's k-means refinement of the IVF codebook as a superstep job.

    State = the codebook ``(cid, cv)``; each superstep assigns every vector
    to its nearest centroid (broadcast codebook, cosine, deterministic tie
    by cid — same rule as ``_ivf_assign``) and recomputes centroids as the
    per-cell elementwise mean inside ``applyInPandas`` (numpy column mean —
    one shuffle on ``cell`` per iteration, Arrow-batched, never a
    collect_list of vectors). Runs on plans/superstep.SuperstepRunner, so
    training inherits checkpoint/resume/metrics like every other iterative
    job. Empty cells keep their previous centroid. Returns a
    SuperstepResult whose state is ``(cid int, cv array<double>)``.

    Seeding = the ``n_centroids`` lowest-id vectors (the training-free
    codebook `ivf_topk` uses by default) — pass the result as
    ``ivf_topk(..., codebook=res.state)`` to upgrade the index without
    changing the assign/probe/rerank plan.

    Pick ``n_centroids`` ≥ the data's natural cluster count: measured on
    the 10-cluster test embeddings, k=10 training lifts top-1 recall
    0.75 → 0.80 over the seed codebook, while k=8 *drops* it to 0.70
    (undersized codebooks merge clusters and boundary queries lose their
    cell). Recall is always recoverable by raising ``nprobe``.
    """
    import numpy as np
    import pandas as pd

    from ..plans.superstep import SuperstepRunner

    base = _vec_base(embeddings, id_col, vec_col).persist()
    base.count()
    init = base.orderBy("id").limit(n_centroids).select(
        F.col("id").cast("int").alias("cid"), F.col("v").alias("cv")
    )

    def mean_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(pdf["v"].to_numpy())
        return pd.DataFrame(
            [{"cid": int(pdf["cell"].iloc[0]), "cv": mat.mean(axis=0).tolist()}]
        )

    def step(state: DataFrame, i: int) -> DataFrame:
        cents = state.select(
            "cid", "cv", l2_norm(F.col("cv")).alias("cnrm")
        )
        assigned = _ivf_assign(base, cents, nprobe=1, quantize=quantize)
        new_cents = (
            assigned.select("cell", "v")
            .groupBy("cell")
            .applyInPandas(mean_kernel, schema="cid int, cv array<double>")
        )
        # empty cells keep their previous centroid
        return state.alias("s").join(
            new_cents.alias("n"), "cid", "left"
        ).select(
            "cid", F.coalesce(F.col("n.cv"), F.col("s.cv")).alias("cv")
        )

    def shift(old: DataFrame, new: DataFrame) -> float:
        d = old.alias("o").join(new.alias("n"), "cid").select(
            F.aggregate(
                F.zip_with(F.col("o.cv"), F.col("n.cv"),
                           lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, x: acc + x,
            ).alias("sq")
        )
        return float(d.agg(F.sum("sq")).first()[0] or 0.0)

    runner = SuperstepRunner(
        spark, max_iters=max_iters, tol=tol, checkpoint_dir=checkpoint_dir,
        config={"algo": "ivf_kmeans", "k": n_centroids},
    )
    try:
        result = runner.run(init, step, metric_fn=shift, resume=resume)
    finally:
        base.unpersist()
    return result


def kcenter_gonzalez(
    spark: SparkSession,
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    quant: int = 1000,
) -> DataFrame:
    """Gonzalez farthest-point k-center selection — the deterministic
    coreset / diversity picker for curation ("give me k maximally spread
    exemplars of this corpus") and a kmeans++-grade seeder for
    `ivf_train_kmeans`.

    Start from the lowest-id vector; k−1 times pick the point FARTHEST
    from the already-chosen set (classic 2-approximation to the optimal
    k-center radius, Gonzalez 1985). Distances are squared L2 over
    integer-QUANTIZED coordinates (``floor(x·quant)`` per dim): exact
    BIGINT arithmetic, so the argmax (ties broken by lowest id) can never
    flip between engines and the unrolled-CTE oracle matches exactly.

    Scale shape: each of the k rounds is ONE map-only pass — ``zip_with``
    /``aggregate`` against the newest center inlined as an array literal
    (a broadcast of one row, no join, no shuffle) — followed by a single
    top-1 reduce. Total k·O(N·d) work, k driver round-trips of one row
    each; pairwise distances are never materialized. The sequential
    argmax is inherent to the algorithm (each pick depends on the last),
    so k tiny supersteps IS the distributed formulation; the running
    min-distance column carries forward so round j re-scans one center,
    not j.

    Returns k rows ``(rnk, center_id, radius)``; ``radius`` is the
    pick's distance to the previously-chosen set at selection time —
    non-increasing, and pick j+1's radius lower-bounds 2·OPT_j.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    q = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * quant).cast("long"),
        ).alias("q"),
    ).persist()

    def dist_to(center_vals) -> Column:
        c = F.array(*[F.lit(int(v)) for v in center_vals])
        return F.aggregate(
            F.zip_with(F.col("q"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    first_rows = q.orderBy("id").limit(1).collect()
    if not first_rows:
        q.unpersist()
        return spark.createDataFrame(
            [], "rnk long, center_id long, radius long"
        )
    first = first_rows[0]
    picks = [(1, int(first["id"]), 0)]
    mind = q.select("id", "q", dist_to(first["q"]).alias("d"))
    held = None
    for rnk in range(2, k + 1):
        mind = mind.persist()
        row = mind.orderBy(F.desc("d"), F.asc("id")).limit(1).first()
        if held is not None:
            held.unpersist()
        held = mind
        if row is None:
            break
        picks.append((rnk, int(row["id"]), int(row["d"])))
        if rnk < k:
            mind = mind.select(
                "id", "q",
                F.least(F.col("d"), dist_to(row["q"])).alias("d"),
            )
    if held is not None:
        held.unpersist()
    q.unpersist()
    return spark.createDataFrame(
        picks, "rnk long, center_id long, radius long"
    )
