"""KMV (K-minimum-values) distinct-count sketch — deterministic, mergeable.

The classic bottom-k sketch (Bar-Yossef et al. 2002; the basis of theta
sketches): keep the K smallest values of a uniform hash of the items; with
``kth`` = the K-th smallest over domain ``[0, 2^60)``, the distinct count
estimates as ``(K−1) · 2^60 / kth`` (< K distinct hashes ⇒ the sketch IS
the exact distinct set). Three properties make it the engine's kind of
sketch:

- **deterministic**: built on the portable 60-bit md5 hash
  (functions/text.hash60), so the same data yields the same sketch — and
  the same ESTIMATE — in any engine; the catalog carries an exact DuckDB
  oracle for an approximate operator (the LSH/IVF pattern).
- **mergeable**: union of sketches = bottom-K of the concatenation —
  re-aggregable across partitions/chunks/days like count+sum.
- **scale-shaped**: the bottom-K per group comes from a TWO-LEVEL rank
  window over deduped hashes (shard-partial bottom-k, then bottom-k of
  the ≤ shards·k survivors) — a hot group's distinct set is never sorted
  in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hash60

DOMAIN = float(1 << 60)


def bottom_k_hashes(hashed: DataFrame, k: int, shards: int) -> DataFrame:
    """Bottom-``k`` per group of DISTINCT ``(g, h)`` hash rows →
    ``(g, sketch sorted array<long>, n_kept)``.

    Two-level bottom-k: level 1 ranks within (group, ``h % shards``) — a
    hot group's distinct hashes spread over ``shards`` tasks, each keeping
    ≤ k — then level 2 ranks the ≤ shards·k survivors per group. The
    global bottom-k is a subset of every shard-level bottom-k, so the
    result is identical to the single-window form while no task ever sees
    more than (group's distinct)/shards + shards·k rows."""
    w1 = Window.partitionBy("g", "__s").orderBy("h")
    survivors = (
        hashed.withColumn("__s", F.pmod(F.col("h"), F.lit(shards)))
        .withColumn("__r", F.row_number().over(w1))
        .where(F.col("__r") <= k)
    )
    w2 = Window.partitionBy("g").orderBy("h")
    return (
        survivors.withColumn("__r2", F.row_number().over(w2))
        .where(F.col("__r2") <= k)
        .groupBy("g")
        .agg(
            F.sort_array(F.collect_list("h")).alias("sketch"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )


def kmv_sketch(df: DataFrame, group_col: str, item_col: str,
               k: int = 64, shards: int = 64) -> DataFrame:
    """Per group: the bottom-``k`` distinct item hashes as a sorted array
    (``sketch``), plus ``n_kept``. Mergeable: union two sketches by
    re-taking the bottom-k of the concatenation (``kmv_merge``)."""
    hashed = df.groupBy(
        F.col(group_col).alias("g"), hash60(F.col(item_col)).alias("h")
    ).agg(F.lit(1).alias("__one"))
    return bottom_k_hashes(hashed, k, shards)


def kmv_merge(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Merge per-group sketch rows (e.g. per-day partials) into one sketch
    per group: bottom-k of the concatenated hash arrays."""
    return (
        sketches.select("g", F.explode("sketch").alias("h"))
        .groupBy("g", "h").agg(F.lit(1).alias("__one"))
        .withColumn(
            "__r", F.row_number().over(Window.partitionBy("g").orderBy("h"))
        )
        .where(F.col("__r") <= k)
        .groupBy("g")
        .agg(
            F.sort_array(F.collect_list("h")).alias("sketch"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )


def kmv_estimate(sketches: DataFrame, k: int = 64) -> DataFrame:
    """(g, est) distinct-count estimate per group: exact ``n_kept`` when
    the sketch is unsaturated, else ``(k−1)·2^60 / kth`` — integer inputs
    and one IEEE division, so the estimate is bit-reproducible in SQL."""
    kth = F.element_at(F.col("sketch"), k).cast("double")
    return sketches.select(
        "g",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(DOMAIN) / kth)
        .alias("est"),
    )


# ---- HyperLogLog (capped-register, pure-integer estimate) --------------------

HLL_M = 64        # buckets (b = 6 bits via modulo on the 60-bit hash)
HLL_RCAP = 26     # register cap — keeps the estimate numerator in int64


def _hll_w(m: int) -> int:
    """Rank-window width for m buckets: w = h div m < 2^(60 - log2 m).
    m must be a power of two — a ragged modulo would skew both the
    bucket distribution and the window width."""
    b = m.bit_length() - 1
    if m <= 0 or (1 << b) != m:
        raise ValueError(f"HLL m must be a power of two, got {m}")
    return 60 - b


def _hll_alpha_e5(m: int) -> int:
    """round(1e5 · α_m), α_m = 0.7213 / (1 + 1.079/m) (Flajolet §4) —
    a compile-time integer constant, so both engines stay float-free."""
    return round(1e5 * 0.7213 / (1 + 1.079 / m))


def hll_registers(df: DataFrame, group_col: str, item_col: str,
                  m: int = HLL_M, rcap: int = HLL_RCAP) -> DataFrame:
    """Per-group HyperLogLog register table ``(g, b, reg)`` (Flajolet et
    al. 2007) over the portable 60-bit hash: bucket ``b = h mod m``, rank
    ``ρ = leading zeros of the remaining W-bit window + 1`` computed as
    ``W+1 − bitlength(w)`` with ``bin()`` (minimal binary — identical in
    Spark and DuckDB), capped at ``rcap``.

    MERGEABLE: registers combine by per-bucket max, so shard-local
    sketches union + re-aggregate into the global sketch — the property
    that makes the sketch one combiner-backed groupBy at any scale (no
    distinct shuffle of the raw items, unlike exact count-distinct).
    """
    # two-step projection so the window shift is exact LONG `div` —
    # h < 2^60 exceeds the 2^53 float-exact range, a `/` would round
    w_bits = _hll_w(m)
    hashed = df.select(
        F.col(group_col).alias("g"), hash60(F.col(item_col)).alias("h")
    ).select("g", F.pmod(F.col("h"), F.lit(m)).alias("b"),
             F.expr(f"h div {m}").alias("w"))
    rho = F.when(F.col("w") > 0,
                 F.lit(w_bits + 1) - F.length(F.bin(F.col("w")))) \
           .otherwise(F.lit(w_bits + 1))
    return (
        hashed.select(
            "g", "b", F.least(rho, F.lit(rcap)).cast("long").alias("r")
        )
        .groupBy("g", "b")
        .agg(F.max("r").alias("reg"))
    )


def hll_merge(registers: DataFrame) -> DataFrame:
    """Merge register tables from any number of shards: per-bucket max."""
    return registers.groupBy("g", "b").agg(F.max("reg").alias("reg"))


def hll_estimate(registers: DataFrame, m: int = HLL_M,
                 rcap: int = HLL_RCAP) -> DataFrame:
    """(g, n_buckets, denom, est_e5): the raw HLL estimate
    ``α_m · m² / Σ 2^−reg`` in PURE INTEGER arithmetic — denominator
    ``D = Σ 2^(rcap−reg)`` (absent buckets contribute ``2^rcap``, i.e.
    reg=0), estimate ``est_e5 = α_e5 · m² · 2^rcap div D``.  Numerator
    ≈ 1.95e16 < 2^63; exact on both engines.  No small/large-range
    correction — this is the raw estimator, documented as such (the KMV
    sketch covers the small-cardinality regime exactly)."""
    _hll_w(m)  # validates the power-of-two contract for estimates too
    a_num = _hll_alpha_e5(m) * m * m * (1 << rcap)
    if a_num >= 1 << 63:
        raise ValueError(
            f"α·m²·2^rcap = {a_num} overflows int64 — lower rcap or m"
        )
    return (
        registers.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({rcap} - reg AS INT))"
            )).alias("d_present"),
        )
        .select(
            "g",
            F.col("n_buckets").cast("long").alias("n_buckets"),
            (F.col("d_present")
             + (F.lit(m) - F.col("n_buckets")) * F.lit(1 << rcap))
            .cast("long").alias("denom"),
        )
        .select(
            "g", "n_buckets", "denom",
            F.expr(f"CAST({a_num} AS BIGINT) div denom").alias("est_e5"),
        )
    )


# ---- Bloom filter (bit_or-mergeable membership sketch) -----------------------

BLOOM_WORD_BITS = 60   # bits used per int64 word — the sign bit never set
BLOOM_WORDS = 256      # default filter width: 256 words = 15360 bits
BLOOM_K = 3            # hash functions


def _hash_mod(col, i: int, m: int):
    """Portable 60-bit hash of ``item:i`` mod ``m`` — the position
    convention shared by the Bloom filter (bit position in an m-bit
    filter) and Count-Min (counter column in an m-wide row), mirrored
    expression-for-expression by the DuckDB oracles."""
    return F.pmod(
        hash60(F.concat(col.cast("string"), F.lit(f":{i}"))), F.lit(m)
    )


def bloom_build(df: DataFrame, item_col: str, k: int = BLOOM_K,
                words: int = BLOOM_WORDS) -> DataFrame:
    """(word, bits): Bloom filter over the items (Bloom 1970) as a sparse
    int64 word table — bit ``p mod 60`` of word ``p div 60`` set for each
    of the ``k`` hash positions ``p`` of each item.

    MERGEABLE: filters over shards combine by per-word ``bit_or`` — the
    same one-line aggregation that builds them (``bloom_merge``), so a
    100-TB corpus builds its membership filter as one combiner-backed
    groupBy and re-aggregates it across days/partitions like count+sum.
    Only bits 0..59 of each word are used, so words stay nonnegative and
    every shift/div below is portable trunc-division arithmetic."""
    m_bits = words * BLOOM_WORD_BITS
    pos = df.select(
        F.explode(F.array(*[
            _hash_mod(F.col(item_col), i, m_bits) for i in range(k)
        ])).alias("p")
    )
    return (
        pos.select(
            F.expr(f"p div {BLOOM_WORD_BITS}").alias("word"),
            F.pmod(F.col("p"), F.lit(BLOOM_WORD_BITS)).alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or(F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"
        )).alias("bits"))
    )


def bloom_merge(filters: DataFrame) -> DataFrame:
    """Merge word tables from any number of shards: per-word bit_or."""
    return filters.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(flt: DataFrame, probes: DataFrame, item_col: str,
                k: int = BLOOM_K, words: int = BLOOM_WORDS) -> DataFrame:
    """(id = probe item, predicted): membership verdict per DISTINCT probe
    item — 1 iff all ``k`` bit positions are set (no false negatives by
    construction; false positives at the classic ``(1−e^{−kn/m})^k``
    rate).  The probe is an equi-join on the word key against the sparse
    filter table — at scale the filter (≤ ``words`` rows) broadcasts."""
    m_bits = words * BLOOM_WORD_BITS
    ppos = probes.select(F.col(item_col).alias("id")).distinct().select(
        "id",
        F.explode(F.array(*[
            _hash_mod(F.col("id"), i, m_bits) for i in range(k)
        ])).alias("p"),
    ).select(
        "id",
        F.expr(f"p div {BLOOM_WORD_BITS}").alias("word"),
        F.pmod(F.col("p"), F.lit(BLOOM_WORD_BITS)).alias("b"),
    )
    bit = F.expr(
        "(coalesce(bits, CAST(0 AS BIGINT))"
        " div shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))) % 2"
    )
    return (
        ppos.join(flt, "word", "left")
        .select("id", bit.alias("bit"))
        .groupBy("id")
        .agg(F.min("bit").cast("long").alias("predicted"))
    )


# ---- Count-Min sketch (sum-mergeable frequency sketch) ------------------------

CMS_DEPTH = 3      # hash rows
CMS_WIDTH = 1024   # counters per row


def cms_build(df: DataFrame, item_col: str, depth: int = CMS_DEPTH,
              width: int = CMS_WIDTH) -> DataFrame:
    """(row, col, cnt): Count-Min sketch (Cormode & Muthukrishnan 2005)
    over the item stream — each occurrence increments one counter per
    hash row.

    MERGEABLE: sketches over shards/days combine by per-cell SUM
    (``cms_merge``) — the frequency analog of the Bloom filter's bit_or
    and the HLL registers' max; one combiner-backed groupBy builds it at
    any scale, with at most depth·width cells ever materialized."""
    cells = df.select(F.explode(F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            _hash_mod(F.col(item_col), i, width).alias("col"),
        )
        for i in range(depth)
    ])).alias("c")).select("c.row", "c.col")
    return (
        cells.groupBy("row", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge cell tables from any number of shards: per-cell sum."""
    return sketches.groupBy("row", "col").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_query(cms: DataFrame, probes: DataFrame, item_col: str,
              depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """(id = probe item, est): point-frequency estimate per DISTINCT probe
    — min over the item's ``depth`` counters (absent cell → 0).  Never
    underestimates; overestimates by collision mass at the classic
    ``ε = e/width`` rate.  The probe equi-joins the ≤ depth·width-row
    cell table, which broadcasts at any corpus scale."""
    ppos = probes.select(F.col(item_col).alias("id")).distinct().select(
        "id",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("row"),
                _hash_mod(F.col("id"), i, width).alias("col"),
            )
            for i in range(depth)
        ])).alias("c"),
    ).select("id", "c.row", "c.col")
    return (
        ppos.join(cms, ["row", "col"], "left")
        .select("id", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .groupBy("id")
        .agg(F.min("cnt").cast("long").alias("est"))
    )
