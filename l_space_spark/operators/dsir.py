"""DSIR-style data selection — hashed-n-gram importance weighting of a
raw corpus against a target (high-quality) corpus.

The shape of Xie et al. 2023 ("Data Selection for Language Models via
Importance Resampling"): featurize every document as hashed bigram
counts, estimate bucket frequencies under the TARGET distribution (the
curated subset you want more of) and the RAW distribution (everything),
score each raw document by how target-like its buckets are, and keep the
top-scoring slice. This is the standard pretraining-corpus targeting
pass (e.g. "select web pages that look like Wikipedia").

Exactness contract: the paper scores with Σ log(p̂_t(b)/p̂_r(b)); IEEE
``ln`` is not reproducible across engines, so the per-bucket weight here
is the e6 fixed-point SMOOTHED FREQUENCY RATIO itself,

    w(b) = round_half_up(1e6 · (t_b + 1)(R + B) / ((r_b + 1)(T + B)))

(add-one smoothing over B buckets; T/R = total target/raw bigram
occurrences) — per-gram monotone in the same likelihood ratio the paper
ranks by, and pure BIGINT/decimal arithmetic, so the catalog carries an
exact DuckDB oracle. A doc's score is the SUM of its bucket weights over
bigram OCCURRENCES (length-sensitive, like the paper's log-sum), and the
selection ranks by the length-normalized mean weight (round-half-up e6)
with doc-id tie-break.

Scale shape (100-TB contract): bigrams come from a per-row array
``transform`` (no position self-join); bucket counting is ONE
combiner-backed groupBy over the hashed bucket id computing both corpus
counts in the same pass (conditional sum — the target membership is a
row predicate, not a second scan); the weight table has ≤ ``buckets``
rows and BROADCASTS back onto the doc-bucket occurrences; the per-doc
sum is a second combiner-backed groupBy. Two narrow shuffles total,
both on high-cardinality keys. The only knob is ``buckets`` (the paper
uses 2^16 for hashed bigrams).

Reference analog: none — L-space ships no corpus operators; this sits
beside lm_familiarity / hashed_linear_score (functions/text.py) in the
quality-scoring family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fp_e6 as _fp_e6
from ..functions.text import hash60, tokens


def _div_half_up(num: Column, den: Column) -> Column:
    """Exact round-half-up integer divide (no rescale — for values that
    already carry a fixed-point scale)."""
    a = num.cast("decimal(38,0)") * 2 + den.cast("decimal(38,0)")
    b = den.cast("decimal(38,0)") * 2
    return ((a - F.pmod(a, b)) / b).cast("long")


def doc_bucket_occurrences(
    df: DataFrame, id_col: str, text_col: str, buckets: int
) -> DataFrame:
    """(id, bkt) — one row per bigram OCCURRENCE, bucketed by the
    portable 60-bit hash. element_at is 1-based (matches the oracle's
    generate_subscripts convention, same as lm_familiarity)."""
    ts = df.select(F.col(id_col).alias("id"),
                   tokens(F.col(text_col)).alias("ts"))
    grams = F.expr(
        "transform(sequence(1, size(ts) - 1),"
        " i -> concat_ws(' ', element_at(ts, i), element_at(ts, i + 1)))"
    )
    return (
        ts.where(F.size("ts") >= 2)
        .select("id", F.explode(grams).alias("g"))
        .select("id", F.pmod(hash60(F.concat(F.lit("dsir:"), F.col("g"))),
                             F.lit(buckets)).alias("bkt"))
    )


def dsir_weights(
    df: DataFrame,
    target_pred: Column,
    id_col: str,
    text_col: str = "text",
    buckets: int = 2048,
    occ: DataFrame | None = None,
) -> DataFrame:
    """(bkt, t_cnt, r_cnt, w_e6) — the trained importance-weight table.

    ``target_pred`` is a row predicate over ``df`` naming the target
    subset; raw = the whole corpus (the target is counted in both, as in
    the paper — raw is the proposal distribution). Pass a precomputed
    ``occ`` (from :func:`doc_bucket_occurrences`, ideally persisted) to
    share the tokenize+hash pass with a downstream scorer."""
    if occ is None:
        occ = doc_bucket_occurrences(df, id_col, text_col, buckets)
    occ = occ.join(
        df.select(F.col(id_col).alias("id"),
                  target_pred.cast("long").alias("is_t")), "id")
    cnt = occ.groupBy("bkt").agg(
        F.sum("is_t").alias("t_cnt"),
        F.count(F.lit(1)).alias("r_cnt"),
    )
    tot = cnt.agg(
        F.sum("t_cnt").alias("T"), F.sum("r_cnt").alias("R")
    )
    num = (F.col("t_cnt") + 1).cast("decimal(38,0)") \
        * (F.col("R") + buckets).cast("decimal(38,0)")
    den = (F.col("r_cnt") + 1).cast("decimal(38,0)") \
        * (F.col("T") + buckets).cast("decimal(38,0)")
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "bkt",
            F.col("t_cnt").cast("long").alias("t_cnt"),
            F.col("r_cnt").cast("long").alias("r_cnt"),
            _fp_e6(num, den).alias("w_e6"),
        )
    )


def dsir_select(
    df: DataFrame,
    target_pred: Column,
    id_col: str,
    text_col: str = "text",
    buckets: int = 2048,
    top_k: int = 100,
) -> DataFrame:
    """(id, n_bigrams, score_e6, avg_w_e6, rnk) — the ``top_k``
    most-target-like documents (≥1 bigram), ranked by mean bucket weight
    descending, doc id ascending. ``score_e6`` is the raw weight sum."""
    # one tokenize+hash pass, shared between weight training and scoring
    occ = doc_bucket_occurrences(df, id_col, text_col, buckets).persist()
    w = dsir_weights(df, target_pred, id_col, text_col, buckets, occ=occ)
    doc = (
        occ.join(F.broadcast(w.select("bkt", "w_e6")), "bkt")
        .groupBy("id")
        .agg(F.sum("w_e6").alias("score_e6"),
             F.count(F.lit(1)).alias("nb"))
    )
    scored = doc.select(
        "id",
        F.col("nb").cast("long").alias("n_bigrams"),
        F.col("score_e6").cast("long").alias("score_e6"),
        _div_half_up(F.col("score_e6"), F.col("nb")).alias("avg_w_e6"),
    )
    # top-k FIRST via sort+limit (Spark plans TakeOrderedAndProject —
    # per-partition heaps, never a global sort), THEN number the k
    # survivors; a corpus-wide row_number window would single-task the
    # whole doc table at 100 TB
    top = scored.orderBy(F.col("avg_w_e6").desc(), F.col("id")).limit(top_k)
    return top.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.col("avg_w_e6").desc(), F.col("id"))
        ).cast("long"),
    )
