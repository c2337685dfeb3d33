"""Deduplication operators for large-scale training-data pipelines.

Five strategies, all shuffle-planned for the 100 TB regime:

- **exact** — ``sha2(content)`` hash-groupBy: one shuffle on the hash, the
  canonical web-dedup first pass (the engine-level twin of the reference's
  value-identity dedup, ``structure/Values.scala:104-117``).
- **n-gram Jaccard** — exact set similarity on word-n-gram shingles via an
  inverted-index join (explode → join on shingle → count), with the
  threshold test in INTEGER arithmetic (``(1/J_min)·i ≥ (na+nb-i)·1``
  rearranged) so no float boundary exists. All-pairs only within shingle
  buckets — never a cartesian product — but still O(Σ bucket²); at web
  scale this is the *verifier* for candidates, not the candidate generator.
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

from ..functions.text import hash60, shingles


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


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3,
    j_num: int = 1, j_den: int = 2,
) -> DataFrame:
    """(a, b) pairs with shingle-set Jaccard ≥ j_num/j_den (exact, integer
    threshold arithmetic: den·i ≥ num·(na+nb−i)).

    The shingle index is persisted (it feeds three branches: sizes and both
    join sides) and handed to Spark lazily — like triangles_per_vertex, the
    ContextCleaner unpersists it once the returned frame's lineage is
    dropped; blocks are O(Σ|shingles|) (id, hash) pairs."""
    ex = shingle_index(df, id_col, text_col, n).persist()
    sizes = ex.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = ex.select(F.col("id").alias("a"), "g")
    b = ex.select(F.col("id").alias("b"), "g")
    inter = (
        a.join(b, "g").where(F.col("a") < F.col("b"))
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("b"), F.col("n").alias("nb"))
    out = (
        inter.join(sa, "a").join(sb, "b")
        .where(
            (j_den + j_num) * F.col("i") >= j_num * (F.col("na") + F.col("nb"))
        )
        .select("a", "b")
    )
    return out


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
) -> DataFrame:
    """(a, b, hamming) pairs with Hamming(simhash_a, simhash_b) ≤ ``max_hamming``
    via the pigeonhole banded equi-join — the sub-quadratic fingerprint join.

    Split the ``bits``-bit fingerprint into ``max_hamming + 1`` contiguous
    bands: two fingerprints within Hamming distance ``max_hamming`` differ in
    at most ``max_hamming`` bit positions, so at least one band is bit-for-bit
    IDENTICAL (pigeonhole). Candidate pairs are therefore an **equi-join on
    (band_index, band_value)** — a shuffled hash join whose cost is
    O(Σ bucket²) over band-value buckets, not the O(N²) all-pairs theta join
    (BroadcastNestedLoopJoin) of the naive ``a.id < b.id`` formulation.
    Candidates are deduped (a pair can share several bands) and verified
    exactly with ``bit_count(xor) ≤ max_hamming``.

    At 100 TB this is the same plan: one explode (×7 rows), one shuffle on
    the band key, exact verify on the joined rows. Skewed band-values (e.g.
    an all-zero band from empty docs) are the one hazard — AQE skew-join
    splitting handles them; the exact verify keeps correctness regardless.
    """
    n_bands = max_hamming + 1
    base, rem = divmod(bits, n_bands)
    band_structs, lo = [], 0
    for i in range(n_bands):
        w = base + (1 if i < rem else 0)
        mask = (1 << w) - 1
        band_structs.append(
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col(sim_col), lo).bitwiseAND(F.lit(mask)).alias("bv"),
            )
        )
        lo += w
    banded = sims.select(
        F.col(id_col).alias("id"),
        F.col(sim_col).alias("h"),
        F.explode(F.array(*band_structs)).alias("bk"),
    ).select("id", "h", F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv"))
    a = banded.select(
        F.col("id").alias("a"), F.col("h").alias("ha"), "band", "bv"
    )
    b = banded.select(
        F.col("id").alias("b"), F.col("h").alias("hb"), "band", "bv"
    )
    return (
        a.join(b, ["band", "bv"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
        .withColumn("hamming", hamming64(F.col("ha"), F.col("hb")).cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
