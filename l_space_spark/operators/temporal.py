"""Temporal join shapes — as-of and banded range joins.

The reference performs only id-equality moves (SURVEY §2.2: "no sort-merge,
range, as-of, interval, or theta joins"), and naive Spark formulations of
these shapes fall into BroadcastNestedLoopJoin. Both operators here are
re-expressed as ONE equi-shuffle plus window/aggregation work — the shapes a
training-data/event pipeline actually needs (attach latest-prior context to
an event; count events in a sliding window around another stream's rows).

- ``asof_join`` — for each left row, the LATEST right row with
  ``r.ts ≤ l.ts`` (per key): union-tag both sides, one window pass with a
  running ``last(right_value, ignorenulls)``. One shuffle on the key, zero
  per-row subqueries; at any scale the cost is a sort within key partitions
  (Spark's window) — the same plan a dedicated ASOF implementation lowers
  to. Right rows must be unique per (key, ts) for determinism — pre-dedup.
- ``banded_range_join_count`` — for each left row, COUNT right rows with
  ``l.ts + lo ≤ r.ts ≤ l.ts + hi`` (per key): band time into
  ``width = hi − lo`` buckets; every qualifying right row lies in one of
  the ≤2 buckets overlapping the left row's range, so candidates are an
  equi-join on (key, bucket) with a ×2 left-side explode — never a theta
  join. O(|L| + |R| + matches) shuffle, plan-pinned BNLJ-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the latest ``right`` row's
    ``right_cols`` (and its timestamp as ``{ts_col}{suffix}``) among rows of
    the same key with ``r.ts ≤ l.ts``; nulls when no prior right row.

    Ties at equal timestamps: the right row counts (non-strict ≤), which
    requires ``right`` unique per (key, ts) — enforce upstream (e.g. keep
    the max-id row) or the kept row is undefined.
    """
    payload = F.struct(
        F.col(ts_col).alias("__ts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        F.col(key_col), F.col(ts_col), payload.alias("__rv"),
        F.lit(0).alias("__side"),
    )
    l_cols = left.columns
    l = left.select(
        *l_cols, F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        F.lit(1).alias("__side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = F.last("__rv", ignorenulls=True).over(w)
    out = (
        u.withColumn("__m", matched)
        .where(F.col("__side") == 1)
        .select(
            *l_cols,
            F.col("__m.__ts").alias(f"{ts_col}{suffix}"),
            *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    )
    return out


def _banded_candidates(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    lo_s: float,
    hi_s: float,
    left_id: str,
    right_id: str | None = None,
) -> DataFrame:
    """Shared candidate generation for the banded range joins: exact
    matches ``(__lid, [__rid,] __k, __lt, __rt)`` with
    ``l.ts + lo_s ≤ r.ts ≤ l.ts + hi_s`` via the ×2 bucket equi-join.

    ``hi_us`` is DERIVED from ``lo_us + width_us`` (not rounded
    independently): for fractional bounds, independent rounding can make
    the probed interval one microsecond longer than the bucket width, so
    it would span 3 buckets while only the 2 endpoint buckets are probed
    — silently undercounting the middle bucket.
    """
    width_us = int(round((hi_s - lo_s) * 1_000_000))
    if width_us <= 0:
        raise ValueError("hi_s must exceed lo_s")
    lo_us = int(round(lo_s * 1_000_000))
    hi_us = lo_us + width_us

    l = left.select(
        F.col(left_id).alias("__lid"), F.col(key_col).alias("__k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__lt"),
    )
    rcols = [
        F.col(key_col).alias("__k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__rt"),
    ]
    if right_id is not None:
        rcols.insert(0, F.col(right_id).alias("__rid"))
    r = right.select(*rcols).withColumn(
        "__b", F.floor(F.col("__rt") / F.lit(width_us))
    )
    probes = l.withColumn(
        "__b",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col("__lt") + F.lit(lo_us)) / F.lit(width_us)),
                    F.floor((F.col("__lt") + F.lit(hi_us)) / F.lit(width_us)),
                )
            )
        ),
    )
    return probes.join(r, ["__k", "__b"]).where(
        (F.col("__rt") >= F.col("__lt") + F.lit(lo_us))
        & (F.col("__rt") <= F.col("__lt") + F.lit(hi_us))
    )


def banded_range_join_count(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    lo_s: float,
    hi_s: float,
    left_id: str,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Per left row, the COUNT of right rows of the same key with
    ``l.ts + lo_s ≤ r.ts ≤ l.ts + hi_s`` (seconds; e.g. ``lo_s=-3600,
    hi_s=0`` = the preceding hour). Zero-count left rows are kept.
    ``left_id`` must be UNIQUE across left rows (like asof_join's
    right-side dedup precondition): duplicate ids would merge their
    windows' counts and fan the sum back onto every duplicate.

    Candidates via time-bucket banding (bucket = ``hi_s − lo_s`` wide):
    any qualifying right row falls in one of the two buckets overlapping
    the left row's range, so the join is an equi-join on (key, bucket)
    after a ×2 left explode — the scale-safe replacement for the
    inequality theta join. The exact range test filters candidates.
    """
    hits = (
        _banded_candidates(left, right, key_col, ts_col, lo_s, hi_s, left_id)
        .groupBy("__lid")
        .agg(F.count(F.lit(1)).alias(count_alias))
    )
    return (
        left.join(hits, left[left_id] == hits["__lid"], "left")
        .drop("__lid")
        .withColumn(count_alias, F.coalesce(F.col(count_alias), F.lit(0)))
    )


def banded_interval_pairs(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    lo_s: float,
    hi_s: float,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """The PAIR-returning sibling of ``banded_range_join_count``: one row
    ``(left_id, right_id, key, l_ts_us, r_ts_us)`` per qualifying pair
    (same key, ``l.ts + lo_s ≤ r.ts ≤ l.ts + hi_s``). Identical ×2
    bucket equi-join candidate generation — the scale-safe shape for a
    batch interval join, and the batch twin of
    ``streaming.interval_join_stream`` (whose state Spark bounds with
    the watermark instead of the bucket)."""
    return _banded_candidates(
        left, right, key_col, ts_col, lo_s, hi_s, left_id, right_id
    ).select(
        F.col("__lid").alias(left_id),
        F.col("__rid").alias(right_id),
        F.col("__k").alias(key_col),
        F.col("__lt").alias("l_ts_us"),
        F.col("__rt").alias("r_ts_us"),
    )
