"""Deduplication operators for large-scale training-data pipelines.

Five strategies, all shuffle-planned for the 100 TB regime:

- **exact** — ``sha2(content)`` hash-groupBy: one shuffle on the hash, the
  canonical web-dedup first pass (the engine-level twin of the reference's
  value-identity dedup, ``structure/Values.scala:104-117``).
- **n-gram Jaccard** — exact set similarity on word-n-gram shingles, with
  the threshold test in INTEGER arithmetic (``(1/J_min)·i ≥ (na+nb-i)·1``
  rearranged) so no float boundary exists. Candidate generation is
  PPJoin-style prefix filtering (lossless — each document indexes only its
  globally-rarest shingles; a hot boilerplate shingle never self-joins),
  verified by an exact intersection count over candidates only.
- **n-gram containment** — the asymmetric variant (``|Sa∩Sb|/|Sa|``,
  Broder's containment): quote/excerpt/superset detection; prefix-filtered
  on the pair's smaller side (the overlap bound ⌈c·min⌉), same lossless
  candidate/verify split.
- **MinHash + LSH** — the candidate generator: K portable hashes per
  shingle → per-doc signature (groupBy-min, one shuffle), banded into
  B band-keys; candidates = equi-join on band key. Scales as O(candidates),
  the textbook sub-quadratic near-dup pipeline.
- **SimHash** — 60-bit weighted-sign fingerprint; Hamming-close pairs ≈
  near-dups. Bit loop is a Catalyst ``sequence``+aggregation, no UDF.
- **embedding cosine** — see operators/similarity.py.

All hash families are md5-derived (functions/text.hash60) and therefore
reproducible in ANSI SQL — the query catalog carries EXACT DuckDB oracles
for every one of these (queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import fp_e6, hash60, shingles


def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(text_sha, n_copies) for groups with more than one copy."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("text_sha"))
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
    )


def keep_first_exact(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Drop exact duplicates, keeping the minimum id per content hash."""
    sha = F.sha2(F.col(text_col), 256)
    keep = df.groupBy(sha.alias("__sha")).agg(F.min(id_col).alias(id_col))
    return df.join(keep, id_col, "left_semi")


def shingle_index(df: DataFrame, id_col: str, text_col: str = "text",
                  n: int = 3) -> DataFrame:
    """(id, g) inverted index of distinct word-n-gram shingles.

    Tokenization is projected FIRST so the regexp runs once per row, then
    the gram builder works over the materialized array — see
    functions/text.shingles_of_tokens for why this split is 10×."""
    from ..functions.text import shingles_of_tokens, tokens

    ts = df.select(F.col(id_col).alias("id"),
                   tokens(F.col(text_col)).alias("__ts"))
    return ts.select(
        "id", F.explode(shingles_of_tokens(F.col("__ts"), n)).alias("g")
    )


def _df_ranked_index(ex: DataFrame) -> DataFrame:
    """(id, g, r, n): the shingle index with each document's shingles
    RANKED by ascending global document frequency (ties by shingle — a
    total order shared by every document) plus the document's set size.

    This is the PPJoin/prefix-filter ordering (Chaudhuri, Ganti, Kaushik
    ICDE 2006; Xiao et al. WWW 2008): under any shared total order, two
    sets with overlap ≥ o share their SMALLEST common element, which sits
    inside both (size − o + 1)-prefixes — so candidate generation may join
    on the rarest few shingles only, and the hot boilerplate shingle
    (license header, nav bar; df → 10⁶ at web scale) that makes a naive
    inverted-index self-join O(df²) never enters the join unless a
    document consists of almost nothing else.  The rank window is
    per-document (bounded by document length), never global.

    The set size ``n`` rides the SAME per-id exchange as the rank
    window (an unbounded count over the id partition) — one shuffle,
    not a separate groupBy + join."""
    from pyspark.sql import Window

    w = Window.partitionBy("id")
    dfs = ex.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    return ex.join(dfs, "g").select(
        "id", "g",
        F.row_number().over(w.orderBy("df", "g")).alias("r"),
        F.count(F.lit(1)).over(w).alias("n"),
    )


def _verified_intersections(cand: DataFrame, ex: DataFrame,
                            carry: tuple[str, ...] = ()) -> DataFrame:
    """(a, b, *carry, i): exact shingle-intersection counts for
    candidate pairs (a < b) — the verify tier, O(Σ_cand |Sa|) not
    O(Σ bucket²). ``carry`` columns (functionally dependent on the
    pair, e.g. the sizes the candidate join already holds) ride the
    groupBy so callers skip a re-join against the size table."""
    return (
        cand.join(ex.select(F.col("id").alias("a"), "g"), "a")
        .join(ex.select(F.col("id").alias("b"), "g"), ["b", "g"])
        .groupBy("a", "b", *carry).agg(F.count(F.lit(1)).alias("i"))
    )


def jaccard_prefix_candidates(
    ex: DataFrame, j_num: int, j_den: int,
) -> DataFrame:
    """(a, b, na, nb) candidate pairs for Jaccard ≥ j_num/j_den over the
    shingle index ``ex(id, g)`` — the prefix-filter generation stage,
    exported so probes measure the EXACT production join (a hand-copied
    twin would silently drift).  Prefix length n − ⌈t·n⌉ + 1 with
    ⌈t·n⌉ = (j_num·n + j_den − 1) div j_den; the size filter is
    t·na ≤ nb ≤ na/t cross-multiplied."""
    ranked = _df_ranked_index(ex)
    plen = (
        F.col("n")
        - F.expr(f"({j_num} * n + {j_den} - 1) div {j_den}")
        + F.lit(1)
    )
    pref = ranked.where(F.col("r") <= plen).persist()
    pa = pref.select(F.col("id").alias("a"), "g", F.col("n").alias("na"))
    pb = pref.select(F.col("id").alias("b"), "g", F.col("n").alias("nb"))
    return (
        pa.join(pb, "g")
        .where(
            (F.col("a") < F.col("b"))
            & (F.lit(j_den) * F.col("nb") >= F.lit(j_num) * F.col("na"))
            & (F.lit(j_den) * F.col("na") >= F.lit(j_num) * F.col("nb"))
        )
        .select("a", "b", "na", "nb").distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3,
    j_num: int = 1, j_den: int = 2,
) -> DataFrame:
    """(a, b) pairs with shingle-set Jaccard ≥ j_num/j_den (exact, integer
    threshold arithmetic: den·i ≥ num·(na+nb−i)).

    Candidate generation is PREFIX-FILTERED (lossless): J ≥ t implies
    overlap i ≥ t·max(na, nb) (union ≥ max), so each document indexes only
    its n − ⌈t·n⌉ + 1 globally-rarest shingles and a qualifying pair MUST
    collide there (see _df_ranked_index).  A size filter
    (t·na ≤ nb ≤ na/t, integer cross-multiplied) prunes before the exact
    intersection-count verify stage, which preserves the original
    inverted-index semantics row-for-row.  The shingle index is persisted
    (it feeds the df-rank, both prefix sides and the verifier); the
    ContextCleaner unpersists it once the returned frame's lineage is
    dropped."""
    ex = shingle_index(df, id_col, text_col, n).persist()
    cand = jaccard_prefix_candidates(ex, j_num, j_den)
    inter = _verified_intersections(cand, ex, carry=("na", "nb"))
    return (
        inter.where(
            (j_den + j_num) * F.col("i") >= j_num * (F.col("na") + F.col("nb"))
        )
        .select("a", "b")
    )


def containment_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3,
    c_num: int = 1, c_den: int = 2,
) -> DataFrame:
    """(a, b, common, na, containment_e6) — ORDERED pairs where the
    shingle set of ``a`` is ≥ ``c_num/c_den`` contained in ``b``'s:
    ``|Sa ∩ Sb| / |Sa| ≥ c_num/c_den`` (a ≠ b).

    Containment is the asymmetric sibling of Jaccard: it catches
    quote/excerpt/superset relations Jaccard misses (a short doc fully
    embedded in a long one has high containment but low Jaccard — the
    Broder resemblance-vs-containment distinction).

    Candidate generation is PREFIX-FILTERED (lossless): a pair passing in
    EITHER direction has overlap i ≥ ⌈c·min(na, nb)⌉ =: o, and by the
    prefix lemma (_df_ranked_index) the smallest common shingle under the
    global df-order lies in BOTH (size − o + 1)-prefixes.  o depends only
    on the smaller document, so the join probes the smaller side's
    c-prefix against the larger side's ranked index with the pair's exact
    rank bound ``r_w ≤ n_w − o + 1`` applied inside the equi-join — the
    hot boilerplate shingle never fans out df² candidates (it is indexed
    on the probe side only by near-pure-boilerplate documents).  The
    unordered intersection counts are then verified exactly and fan out
    to both directions only AFTER the groupBy, so the heavy aggregation
    runs once per unordered pair.  Threshold test in integer arithmetic
    (``c_den·i ≥ c_num·na``); the reported score is e6 fixed point via
    the exact round-half-up divide."""
    ex = shingle_index(df, id_col, text_col, n).persist()
    ranked = _df_ranked_index(ex).persist()
    # smaller side's prefix: n − ⌈c·n⌉ + 1 rarest shingles
    plen = (
        F.col("n")
        - F.expr(f"({c_num} * n + {c_den} - 1) div {c_den}")
        + F.lit(1)
    )
    pu = (
        ranked.where(F.col("r") <= plen)
        .select(F.col("id").alias("u"), "g", F.col("n").alias("nu"))
    )
    pw = ranked.select(
        F.col("id").alias("w"), "g",
        F.col("r").alias("rw"), F.col("n").alias("nw"),
    )
    # (nw, w) > (nu, u): u is the unordered pair's smaller document
    # (ties by id); the w-side rank bound is the prefix lemma's
    # n_w − ⌈c·n_u⌉ + 1, evaluated per joined row.
    cand = (
        pu.join(pw, "g")
        .where(
            (
                (F.col("nw") > F.col("nu"))
                | ((F.col("nw") == F.col("nu")) & (F.col("w") > F.col("u")))
            )
            & (
                F.col("rw")
                <= F.col("nw")
                - F.expr(f"({c_num} * nu + {c_den} - 1) div {c_den}")
                + F.lit(1)
            )
        )
        .select(
            F.least("u", "w").alias("a"),
            F.greatest("u", "w").alias("b"),
            F.when(F.col("u") < F.col("w"), F.col("nu"))
            .otherwise(F.col("nw")).alias("sa"),
            F.when(F.col("u") < F.col("w"), F.col("nw"))
            .otherwise(F.col("nu")).alias("sb"),
        )
        .distinct()
    )
    inter = _verified_intersections(cand, ex, carry=("sa", "sb"))
    both = inter.select(
        F.col("a"), F.col("b"), "i", F.col("sa").alias("na")
    ).unionAll(inter.select(
        F.col("b").alias("a"), F.col("a").alias("b"), "i",
        F.col("sb").alias("na"),
    ))
    return (
        both
        .where(c_den * F.col("i") >= c_num * F.col("na"))
        .select(
            "a", "b",
            F.col("i").cast("long").alias("common"),
            F.col("na").cast("long").alias("na"),
            fp_e6(F.col("i"), F.col("na")).alias("containment_e6"),
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 8, n: int = 3
) -> DataFrame:
    """(id, h0..h{k-1}) MinHash signature over word-n-gram shingles."""
    ex = shingle_index(df, id_col, text_col, n)
    aggs = [
        F.min(hash60(F.concat(F.lit(f"{i}:"), F.col("g")))).alias(f"h{i}")
        for i in range(k)
    ]
    return ex.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 2,
                        rows_per_band: int = 4) -> DataFrame:
    """(a, b) candidate pairs sharing at least one LSH band key.

    Signatures are persisted (scanned once per band) and released by the
    ContextCleaner when the returned frame's lineage is dropped — the
    documented lazy-handoff pattern (see triangles_per_vertex)."""
    sig = signatures.persist()
    parts = []
    for band in range(bands):
        cols = [f"h{band * rows_per_band + r}" for r in range(rows_per_band)]
        key = F.md5(F.concat_ws(",", *[F.col(c).cast("string") for c in cols]))
        parts.append(
            sig.select(F.col("id"), F.lit(band).alias("band"), key.alias("bkey"))
        )
    b = parts[0]
    for p in parts[1:]:
        b = b.unionByName(p)
    a1 = b.select(F.col("id").alias("a"), "band", "bkey")
    b1 = b.select(F.col("id").alias("b"), "band", "bkey")
    return (
        a1.join(b1, ["band", "bkey"]).where(F.col("a") < F.col("b"))
        .select("a", "b").distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str = "text",
            bits: int = 60) -> DataFrame:
    """(id, simhash) — ``bits``-bit weighted-sign fingerprint over distinct
    tokens (ties at sum 0 → bit 0, deterministic)."""
    from ..functions.text import tokens

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    h = toks.select("id", hash60(F.col("tok")).alias("hv"))
    per_bit = h.select(
        "id", "hv", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    ).groupBy("id", "bit").agg(
        F.sum(F.when(F.expr("(hv >> bit) & 1") == 1, 1).otherwise(-1)).alias("s")
    )
    return per_bit.groupBy("id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
            .otherwise(F.lit(0).cast("long"))
        ).cast("long").alias("simhash")
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two ≤64-bit fingerprints (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_close_pairs(
    sims: DataFrame,
    id_col: str = "id",
    sim_col: str = "simhash",
    bits: int = 60,
    max_hamming: int = 6,
    n_blocks: int | None = None,
) -> DataFrame:
    """(a, b, hamming) pairs with Hamming(simhash_a, simhash_b) ≤
    ``max_hamming`` via the block-combination banded equi-join (Manku,
    Jain & Sarma, "Detecting Near-Duplicates for Web Crawling", WWW'07).

    Split the ``bits``-bit fingerprint into ``m = n_blocks`` contiguous
    blocks. Hamming ≤ d dirties at most d blocks, so at least ``m − d``
    blocks are bit-for-bit identical — hence SOME (m−d)-subset of blocks
    matches exactly (pigeonhole on subsets). Candidates are an **equi-join
    on (subset_id, the subset's block values)** — C(m, m−d) replicas per
    row, each keyed on ~``bits·(m−d)/m`` bits — then the exact
    ``bit_count(xor) ≤ d`` verify. Never a BroadcastNestedLoopJoin.

    Choosing ``m`` (measured, BENCH/simhash_banded_scaling.json):

    - key width ≈ ``bits·(m−d)/m``; expected random-collision candidates ≈
      ``C(m, m−d)·N²/2^width``. The default ``m = d + 4`` keys on 4-block
      combos (d=6, 60 bits: C(10,4)=210 replicas, ~24-bit keys) — measured
      near-LINEAR on random fingerprints
      (BENCH/simhash_banded_scaling.json): 15 / 14 / 20 / 52 / 125 s at
      100 k / 200 k / 400 k / 800 k / 1.6 M docs, where single-block keys
      (m=d+1, ~8-bit) are quadratic (≈N²/2^8.5 candidates; 544 s at 400 k)
      and the round-1 all-pairs theta join is N² outright.
    - TWO candidate strategies by key width. Wide keys (r ≥ 2): aggregate
      ids per key, pair within buckets (only 16-byte (key, id) rows
      shuffle; fingerprints rejoin on the candidate set) — buckets stay
      small by construction. Single-block keys (r = 1, sensible for SMALL
      dup-dense corpora where wide keys would regenerate every true pair
      C(m,r) times): a streaming self-join on the key, fingerprints
      carried through — dup clusters flow through the codegen join probe
      instead of materializing C(cluster,2)-sized arrays (5 k-doc /
      1.35 M-true-pair corpus: 3.7 s warm vs 15-24 s via buckets).

    The exact verify keeps the output identical for every ``m`` — only
    candidate counts change. Skewed key values (e.g. all-zero blocks from
    empty docs) are the one hazard; AQE handles the shuffle side and the
    in-bucket expansion is bounded by the key width.
    """
    from itertools import combinations

    m = n_blocks if n_blocks is not None else max_hamming + 4
    if m <= max_hamming:
        raise ValueError(f"n_blocks={m} must exceed max_hamming={max_hamming}")
    r = m - max_hamming  # blocks per key: some r-subset is guaranteed clean
    base, rem = divmod(bits, m)
    block_cols, widths, lo = [], [], 0
    for i in range(m):
        w = base + (1 if i < rem else 0)
        widths.append(w)
        block_cols.append(
            F.shiftright(F.col(sim_col), lo).bitwiseAND(F.lit((1 << w) - 1))
            .alias(f"__b{i}")
        )
        lo += w
    # project block values ONCE before fanning out into C(m, r) keys: the
    # keys reference each block C(m-1, r-1) times, and Catalyst
    # re-evaluates non-trivial child expressions per reference (the
    # measured 10× HOF pitfall, functions/text.shingles_of_tokens) — with
    # inline extraction m=10 ran 118 s at 100 k rows. Each subset key is
    # PACKED into one long (subset id in the high bits, then its block
    # values) — a flat 8-byte shuffle/join key measured 4× faster than a
    # struct key.
    with_blocks = sims.select(
        F.col(id_col).alias("id"), F.col(sim_col).alias("h"), *block_cols
    )
    # pack at a FIXED per-block width (max block width): variable widths
    # would let two different (subset, values) keys collide into one long
    wmax = max(widths)
    packed_keys = []
    for g, combo in enumerate(combinations(range(m), r)):
        k = F.lit(g).cast("long")
        for i in combo:
            k = F.shiftleft(k, wmax) + F.col(f"__b{i}")
        packed_keys.append(k)
    if r == 1:
        # single-block keys (small dup-dense corpora): candidates via a
        # STREAMING self-join on the key, fingerprints carried through —
        # dup clusters flow through the codegen join probe instead of
        # materializing C(cluster, 2)-sized pair arrays (measured on the
        # 5 k-doc / 1.35 M-true-pair corpus: join path seconds vs
        # bucket-expansion 15-24 s)
        keyed_h = with_blocks.select(
            "id", "h", F.explode(F.array(*packed_keys)).alias("bk")
        )
        a = keyed_h.select(F.col("id").alias("a"), F.col("h").alias("ha"), "bk")
        b = keyed_h.select(F.col("id").alias("b"), F.col("h").alias("hb"), "bk")
        return (
            a.join(b, "bk")
            .where(F.col("a") < F.col("b"))
            .select("a", "b", "ha", "hb")
            .distinct()
            .withColumn(
                "hamming", hamming64(F.col("ha"), F.col("hb")).cast("long")
            )
            .where(F.col("hamming") <= max_hamming)
            .select("a", "b", "hamming")
        )

    # wide keys: aggregate ids per key (only the 16-byte (bk, id) rows
    # shuffle — fingerprints rejoin later on the far smaller candidate
    # set) and pair up within multi-member buckets JVM-side; wide keys
    # keep buckets small by construction
    keyed = with_blocks.select(
        "id", F.explode(F.array(*packed_keys)).alias("bk")
    )
    buckets = (
        keyed.groupBy("bk").agg(F.collect_list("id").alias("ids"))
        .where(F.size("ids") > 1)
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("ids"),
                lambda x, i: F.transform(
                    F.slice(F.col("ids"), i + 2,
                            F.greatest(F.size(F.col("ids")) - i - 1, F.lit(0))),
                    lambda y: F.struct(
                        F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
                    ),
                ),
            )
        )
    )
    cand = (
        buckets.select(pair.alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .distinct()
    )
    ha = sims.select(F.col(id_col).alias("a"), F.col(sim_col).alias("ha"))
    hb = sims.select(F.col(id_col).alias("b"), F.col(sim_col).alias("hb"))
    return (
        cand.join(ha, "a").join(hb, "b")
        .withColumn("hamming", hamming64(F.col("ha"), F.col("hb")).cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def exact_substring_coverage(df: DataFrame, id_col: str,
                             text_col: str = "text", k: int = 5,
                             min_docs: int = 2) -> DataFrame:
    """Per-document coverage by CROSS-DOCUMENT duplicated k-token spans —
    the ExactSubstr dedup tier (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better") re-expressed relationally: instead
    of a suffix array over the concatenated corpus, every position's
    k-token window is a positional shingle, a window is "duplicated" when
    the same k-gram occurs in ≥ ``min_docs`` distinct documents, and the
    reported coverage is the size of the union of all duplicated windows
    per document (in tokens).

    Output: (id, n_tokens, n_dup_grams, covered_tokens, dup_coverage)
    with dup_coverage the half-up fixed-point share ×10⁴ in pure integer
    arithmetic ((c·20000 + n) div (2n)) — exactly reproducible in the
    DuckDB oracle (queries.py ``exact_substring_dedup``).

    Plan shape for 100 TB: tokenization + gram build are linear
    per-partition projections (token array materialized FIRST — the
    measured 10× HOF pitfall, functions/text.shingles_of_tokens); grams
    travel as 60-bit hashes, never strings, so the only wide shuffle is
    (id, pos, gh) rows; doc-frequency is one combiner-backed groupBy on
    gh; the hits join is an equi-join on the same key (AQE co-plans the
    two stages); the interval-union is a per-document window whose
    partition is bounded by document length — with a FIXED window width
    k the duplicated intervals sorted by start also have sorted ends, so
    the union reduces to Σ least(k, pos − lag(pos)), one pass, no
    interval stack. Reference analog: value-identity dedup
    (structure/Values.scala:104-117) generalized to positional spans.
    """
    from pyspark.sql import Window

    from ..functions.text import tokens

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("ts")
    )
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(F.col("ts"), i + j) for j in range(k)]
    )
    pos_grams = (
        toks.where(F.size("ts") >= k)
        .select(
            "id",
            F.posexplode(
                F.transform(F.sequence(F.lit(1), F.size("ts") - (k - 1)), gram)
            ).alias("pos0", "g"),
        )
        .select("id", (F.col("pos0") + 1).alias("pos"),
                hash60(F.col("g")).alias("gh"))
    )
    # persist: both the doc-frequency groupBy and the hits join consume
    # pos_grams, and ReuseExchange cannot merge them (one side exchanges
    # partial aggregates, the other raw rows) — without the cache the
    # tokenize+gram scan (the measured 10× hot path) runs twice.  Cache
    # drops with lineage; no build-time unpersist (it would evict before
    # the caller materializes the lazy result).
    pos_grams = pos_grams.persist()
    dup = (
        pos_grams.groupBy("gh")
        .agg(F.count_distinct("id").alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("gh")
    )
    hits = pos_grams.join(dup, "gh").select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    per = (
        hits.select("id", "pos", F.lag("pos").over(w).alias("prev"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_grams"),
            F.sum(
                F.when(F.col("prev").isNull(), F.lit(k)).otherwise(
                    F.least(F.lit(k), F.col("pos") - F.col("prev"))
                )
            ).cast("long").alias("covered_tokens"),
        )
    )
    return (
        toks.select("id", F.size("ts").cast("long").alias("n_tokens"))
        .join(per, "id", "left")
        .select(
            "id",
            "n_tokens",
            F.coalesce("n_dup_grams", F.lit(0)).cast("long")
            .alias("n_dup_grams"),
            F.coalesce("covered_tokens", F.lit(0)).cast("long")
            .alias("covered_tokens"),
        )
        .withColumn(
            "dup_coverage",
            F.when(
                F.col("n_tokens") > 0,
                F.expr("(covered_tokens * 20000 + n_tokens)"
                       " div (2 * n_tokens)"),
            ).otherwise(F.lit(0)).cast("long"),
        )
    )


def paragraph_instances(toks: DataFrame, para_tokens: int) -> DataFrame:
    """(id, pos, para, ph) rows: fixed ``para_tokens``-token windows of a
    MATERIALIZED token-array table ``(id, ts)``, with the portable 60-bit
    paragraph hash.  Shared by the dedup-rewrite and clustering tiers."""
    p = F.lit(para_tokens)
    return (
        toks.where(F.size("ts") > 0)
        .select(
            "id",
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.floor(
                            (F.size("ts") + (para_tokens - 1)) / p
                        ).cast("int"),
                    ),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("ts"), (i - 1) * p + 1, para_tokens)
                    ),
                )
            ).alias("pos0", "para"),
        )
        .select(
            "id", (F.col("pos0") + 1).alias("pos"), "para",
            hash60(F.col("para")).alias("ph"),
        )
    )


def boilerplate_star_edges(df: DataFrame, id_col: str,
                           text_col: str = "text",
                           para_tokens: int = 8) -> DataFrame:
    """(src, dst) edges linking every document to the OWNER (min doc id)
    of each paragraph it shares with at least one other document — the
    star topology that makes shared-boilerplate clustering scale: a
    paragraph held by 10⁹ documents contributes 10⁹−1 star edges, not a
    10¹⁸-pair clique, and connectivity (hence the clusters) is
    identical.  Feed to connected_components for boilerplate clusters.

    One combiner-backed groupBy on the paragraph hash (owner + distinct
    holder count) and one equi-join back; no per-paragraph windows.
    """
    from ..functions.text import tokens

    if para_tokens < 1:
        raise ValueError(f"para_tokens must be >= 1, got {para_tokens}")
    toks = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("ts")
    )
    # persist: consumed twice (owner groupBy + the join-back probe) —
    # without it the tokenize+hash scan over the corpus runs twice
    paras = (paragraph_instances(toks, para_tokens)
             .select("id", "ph").distinct().persist())
    owners = paras.groupBy("ph").agg(
        F.min("id").alias("owner"), F.count(F.lit(1)).alias("nd")
    ).where(F.col("nd") >= 2).select("ph", "owner")
    return (
        paras.join(owners, "ph")
        .where(F.col("id") != F.col("owner"))
        .select(F.col("owner").alias("src"), F.col("id").alias("dst"))
        .distinct()
    )


def paragraph_dedup_stats(df: DataFrame, id_col: str,
                          text_col: str = "text",
                          para_tokens: int = 8) -> DataFrame:
    """Paragraph-level exact dedup, C4/RefinedWeb style: the corpus is
    cut into paragraphs (here fixed ``para_tokens``-token windows — the
    synthetic corpus has no newlines), every paragraph that appeared
    EARLIER anywhere in the corpus (lexicographically first (doc, pos)
    occurrence wins, the C4 keep-one rule) is dropped, and each document
    reports its surviving text.  Sits between whole-doc hash dedup
    (dedup_exact / structure/Values.scala:104-117 value identity) and
    span coverage (exact_substring_coverage): it REWRITES documents
    instead of scoring or deleting them.

    Output: (id, n_paras, n_dup_paras, kept_tokens, kept_hash) where
    kept_hash is the portable 60-bit hash of the de-duplicated document
    (kept paragraphs re-joined in position order; empty string when all
    paragraphs were dropped).

    Plan shape for 100 TB: paragraph construction is a per-row
    projection (token array materialized first — the measured HOF
    pitfall); instances travel as (id, pos, 60-bit hash, token-count);
    the first-occurrence owner per hash is ONE combiner-backed
    min-struct groupBy (no window over the hash's occurrence list, so a
    boilerplate paragraph shared by 10^9 docs never single-tasks); the
    verdict join is an equi-join on the same key; reassembly sorts only
    WITHIN each document (collect_list bounded by document length).
    """
    if para_tokens < 1:
        raise ValueError(f"para_tokens must be >= 1, got {para_tokens}")
    from ..functions.text import tokens

    toks = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("ts")
    )
    paras = paragraph_instances(toks, para_tokens)
    # shared by the owner groupBy and the verdict join — same
    # persist-no-unpersist rationale as exact_substring_coverage
    paras = paras.persist()
    owners = paras.groupBy("ph").agg(
        F.min(F.struct("id", "pos")).alias("first")
    )
    judged = paras.join(owners, "ph").select(
        "id", "pos", "para",
        (
            (F.col("first.id") == F.col("id"))
            & (F.col("first.pos") == F.col("pos"))
        ).alias("keep"),
        F.size(F.split("para", " ")).alias("ptok"),
    )
    per = judged.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0))
        .cast("long").alias("n_dup_paras"),
        F.sum(F.when(F.col("keep"), F.col("ptok")).otherwise(0))
        .cast("long").alias("kept_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "para"))
                    )
                ),
                lambda s: s["para"],
            ),
            " ",
        ).alias("kept_text"),
    )
    return (
        toks.select("id")
        .join(per, "id", "left")
        .select(
            "id",
            F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
            F.coalesce("n_dup_paras", F.lit(0)).cast("long")
            .alias("n_dup_paras"),
            F.coalesce("kept_tokens", F.lit(0)).cast("long")
            .alias("kept_tokens"),
            hash60(F.coalesce("kept_text", F.lit(""))).alias("kept_hash"),
        )
    )


def prefix_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str = "text",
    j_num: int = 1, j_den: int = 2,
) -> DataFrame:
    """(a, b, inter_n, size_a, size_b): document pairs whose token-SET
    Jaccard ≥ j_num/j_den, found via PREFIX FILTERING (Chaudhuri, Ganti,
    Kaushik ICDE 2006; Xiao et al. WWW 2008 — the PPJoin family).

    Scale story vs the plain inverted index (``ngram_jaccard_pairs``):
    order every document's tokens by ascending global document frequency
    (ties by token — a total order, identical in both engines) and index
    only the first ``n − ⌈t·n⌉ + 1`` tokens.  Any pair with Jaccard ≥ t
    MUST collide on a prefix token, so candidate generation joins on the
    RAREST tokens only — the hot boilerplate tokens that dominate
    Σbucket² in a naive index never enter the join.  A size filter
    (``t·|A| ≤ |B| ≤ |A|/t``) prunes candidates before the exact-overlap
    verification, which runs only over surviving pairs.

    All threshold arithmetic is integer cross-multiplication: prefix
    length uses ``⌈t·n⌉ = (j_num·n + j_den − 1) div j_den`` (nonnegative
    div — portable), the final test is ``(j_den+j_num)·i ≥
    j_num·(|A|+|B|)``.  The per-document rank window is doc-local
    (bounded by document length, the winnow/chunking discipline)."""
    from pyspark.sql import Window

    from ..functions.text import tokens

    ts = (
        df.select(F.col(id_col).alias("id"),
                  F.explode(tokens(F.col(text_col))).alias("t"))
        .distinct().persist()
    )
    dfs = ts.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    sizes = ts.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    ranked = ts.join(dfs, "t").withColumn(
        "r", F.row_number().over(Window.partitionBy("id").orderBy("df", "t"))
    )
    plen = (
        F.col("n")
        - F.expr(f"({j_num} * n + {j_den} - 1) div {j_den}")
        + F.lit(1)
    )
    pref = ranked.join(sizes, "id").where(F.col("r") <= plen)
    pa = pref.select(F.col("id").alias("a"), "t", F.col("n").alias("na"))
    pb = pref.select(F.col("id").alias("b"), "t", F.col("n").alias("nb"))
    cand = (
        pa.join(pb, "t")
        .where(
            (F.col("a") < F.col("b"))
            & (F.lit(j_den) * F.col("nb") >= F.lit(j_num) * F.col("na"))
            & (F.lit(j_den) * F.col("na") >= F.lit(j_num) * F.col("nb"))
        )
        .select("a", "b").distinct()
    )
    ov = (
        cand.join(ts.select(F.col("id").alias("a"), "t"), "a")
        .join(ts.select(F.col("id").alias("b"), "t"), ["b", "t"])
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("inter_n"))
    )
    return (
        ov.join(sizes.select(F.col("id").alias("a"),
                             F.col("n").alias("size_a")), "a")
        .join(sizes.select(F.col("id").alias("b"),
                           F.col("n").alias("size_b")), "b")
        .where(
            F.lit(j_den + j_num) * F.col("inter_n")
            >= F.lit(j_num) * (F.col("size_a") + F.col("size_b"))
        )
        .select("a", "b", "inter_n", "size_a", "size_b")
    )
