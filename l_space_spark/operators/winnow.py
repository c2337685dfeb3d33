"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm) — the code-payload copy detector, in exact integer arithmetic.

Shape of the idea: hash every k-token gram of a document, slide a window
of ``w`` consecutive gram hashes, and in each window select the minimum
hash (rightmost position on ties).  The selected (position, hash) pairs
are the document's fingerprints.  Guarantee: any match of at least
``w + k - 1`` consecutive tokens between two documents shares at least
one fingerprint, while only ~``2/(w+1)`` of grams are kept — position-
robust copy detection at a fraction of the full-shingle index size.

Determinism/exactness: gram hashes are the portable 60-bit md5
(``functions.text.hash60``), identical in ANSI SQL, so both the
fingerprint set and the match-pair counts have exact DuckDB oracles.
The rightmost-min tie-break is expressed as two combiner-backed
aggregations (min hash per window, then max position among the minima)
— no engine-specific argmin semantics to diverge on.

Scale shape: the window grid multiplies each gram row by at most ``w``
(window memberships), all keyed by (doc, window-start) — document-local,
combiner-friendly, no skew beyond document length (bounded).  Matching
is an inverted-index equi-join on fingerprint hash with a document-
frequency cap (``max_df``) so boilerplate fingerprints never explode the
candidate join — the same discipline as the MinHash-LSH band join
(operators/dedup.py).

Reference analog: none in L-space (no fingerprinting machinery); this is
the source-code near-copy stage a training pipeline runs over a corpus of
repositories before exact-substring dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60, tokens

WINNOW_K = 4  # tokens per gram
WINNOW_W = 4  # gram hashes per window


def _gram_hashes(
    docs: DataFrame, k: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc, i, h): 60-bit hash of the k-token gram starting at token i
    (1-based); documents with fewer than k tokens contribute nothing."""
    ts = docs.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("ts")
    )
    grams = ts.where(F.size("ts") >= k).select(
        "doc",
        F.explode(
            F.sequence(F.lit(1), F.size("ts") - F.lit(k - 1))
        ).alias("i"),
        "ts",
    )
    gram = F.concat_ws(
        " ", *[F.element_at("ts", F.col("i") + F.lit(j)) for j in range(k)]
    )
    return grams.select("doc", "i", hash60(gram).alias("h"))


def winnow_fingerprints(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, pos, fp): winnowing-selected fingerprints — for every window
    of ``w`` consecutive gram hashes, the minimum hash, rightmost pos on
    ties, deduplicated across overlapping windows.  A document with
    fewer grams than ``w`` is covered by one all-gram window (standard
    short-document convention), so every ≥k-token document fingerprints.
    """
    gh = _gram_hashes(docs, k, id_col, text_col)
    ng = gh.groupBy("doc").agg(F.max("i").alias("ng"))
    # window starts covering gram i: s ∈ [max(1, i-w+1), min(i, ng-w+1)]
    # (last start clamped to ≥1 so short docs get the single window s=1)
    grid = (
        gh.join(ng, "doc")
        .select(
            "doc",
            "i",
            "h",
            F.explode(
                F.sequence(
                    F.greatest(F.col("i") - F.lit(w - 1), F.lit(1)),
                    F.least(
                        F.col("i"),
                        F.greatest(F.col("ng") - F.lit(w - 1), F.lit(1)),
                    ),
                )
            ).alias("s"),
        )
    )
    wmin = grid.groupBy("doc", "s").agg(F.min("h").alias("mh"))
    sel = (
        grid.join(wmin, ["doc", "s"])
        .where(F.col("h") == F.col("mh"))
        .groupBy("doc", "s", "h")
        .agg(F.max("i").alias("pos"))
    )
    return (
        sel.select("doc", "pos", F.col("h").alias("fp"))
        .distinct()
    )


def winnow_match_pairs(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = 2,
    max_df: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, shared): ordered candidate copy pairs sharing at
    least ``min_shared`` distinct fingerprint hashes.  Fingerprints held
    by more than ``max_df`` documents are dropped before the pair join —
    boilerplate never becomes a quadratic hot key (inverted-index
    discipline, same as the LSH band join)."""
    fps = winnow_fingerprints(
        docs, k=k, w=w, id_col=id_col, text_col=text_col
    ).select("doc", "fp").distinct()
    df_ok = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
        .select("fp")
    )
    kept = fps.join(df_ok, "fp")
    a = kept.select(F.col("doc").alias("doc_a"), "fp")
    b = kept.select(F.col("doc").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
