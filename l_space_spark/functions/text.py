"""Text primitives shared by the pipeline operators and the query catalog.

Everything is a Catalyst expression (JVM-side, codegen) — no Python UDFs.
The 60-bit md5-derived hash is PORTABLE: the same value is computable in
ANSI SQL (DuckDB: ``('0x'||substr(md5(x),1,15))::BIGINT``), which is what
lets MinHash/SimHash/LSH have exact cross-engine oracles instead of
rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKENS_RE = "[a-z0-9]+"

STOPWORDS = ["a", "the", "and", "of", "to", "in", "is", "it"]

LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}


def tokens(col: Column) -> Column:
    """Lowercased alnum token array."""
    return F.regexp_extract_all(F.lower(col), F.lit(TOKENS_RE), 0)


def hash60(col: Column) -> Column:
    """Portable 60-bit hash: int value of the first 15 hex chars of md5."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingles_of_tokens(ts: Column, n: int = 3) -> Column:
    """Distinct word-n-gram shingle array from a MATERIALIZED token-array
    column (empty when < n tokens).

    Take an already-projected array column, not ``tokens(text)`` inline:
    the gram lambda references the token array ~3n times per row, and
    Catalyst evaluates a non-trivial child expression once PER REFERENCE
    inside higher-order functions — inlining the regexp made shingling 10×
    slower than the regexp itself (measured at sf0.1: 12.3 s → 1.2 s after
    splitting the projection)."""
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(ts, i + j) for j in range(n)]
    )
    return F.when(
        F.size(ts) >= n,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), F.size(ts) - (n - 1)), gram)
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word-n-gram shingle array (empty when < n tokens).
    Prefer ``shingles_of_tokens`` over a pre-projected token column in hot
    paths (see its docstring)."""
    return shingles_of_tokens(tokens(col), n)


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def stopword_count(col: Column, stopwords: list[str] | None = None) -> Column:
    arr = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS)])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(arr, t))).cast("long")


def punct_count(col: Column) -> Column:
    return (F.length(col) - F.length(F.regexp_replace(col, "[.,!?;:]", ""))).cast("long")
