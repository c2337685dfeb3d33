"""Hypertable rollup — incrementally maintained time-chunked aggregates.

The TimescaleDB-style pattern re-expressed on a parquet/Iceberg lake: an
event table is stored PARTITIONED BY a coarse time chunk (`write_hypertable`
— partition pruning makes any time-bounded scan touch only its chunks,
pinned by tests/test_plans.py's pruning test), and a continuous aggregate
(`refresh_rollup`) is maintained chunk-by-chunk: a refresh fingerprints
each chunk's file listing, recomputes ONLY chunks whose files changed since
the recorded state, and overwrites just those partitions of the rollup
table. At 100 TB this is the only viable shape — a day of late data
re-aggregates one chunk, not the table — and on Iceberg the fingerprint
collapses to the chunk's snapshot/file manifest.

Aggregates are RE-MERGEABLE by construction (count, sum; mean = sum/count
at query time), so per-chunk recomputation is exact. Reading the rollup is
a plain partitioned scan; `rollup_view` unions finished chunks with a raw
tail when fresher-than-rollup data must be visible.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

META_NAME = "_rollup_meta.json"


def write_hypertable(events: DataFrame, path: str, ts_col: str = "ts",
                     chunk: str = "day") -> None:
    """Write the event table partitioned by the coarse time chunk
    (``__chunk`` = date_trunc(chunk) as a date string — the hypertable
    layout; on Iceberg this is the ``days(ts)`` partition transform)."""
    (
        events.withColumn(
            "__chunk",
            F.date_format(F.date_trunc(chunk, F.col(ts_col)), "yyyy-MM-dd"),
        )
        .write.mode("overwrite")
        .partitionBy("__chunk")
        .parquet(path)
    )


def _chunk_fingerprints(path: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for name in sorted(os.listdir(path)):
        if not name.startswith("__chunk="):
            continue
        chunk_dir = os.path.join(path, name)
        listing = "\n".join(
            f"{f}:{os.path.getsize(os.path.join(chunk_dir, f))}"
            for f in sorted(os.listdir(chunk_dir))
            if not f.startswith((".", "_"))
        )
        out[name.split("=", 1)[1]] = hashlib.sha256(
            listing.encode()
        ).hexdigest()[:16]
    return out


def refresh_rollup(
    spark: SparkSession,
    hypertable_path: str,
    rollup_path: str,
    bucket: str = "hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> list[str]:
    """Bring the rollup up to date; returns the list of chunk ids actually
    recomputed (empty = nothing changed — the steady-state no-op).

    Per changed/new chunk (file-listing fingerprint vs the recorded meta):
    scan ONLY that chunk (partition pruning), aggregate per (bucket, key)
    — count + sum, the re-mergeable pair — and overwrite just that chunk's
    partition of the rollup. Chunks that disappeared are dropped from the
    meta (their rollup partition is rewritten away on Iceberg; here the
    stale directory is removed)."""
    import shutil

    fps = _chunk_fingerprints(hypertable_path)
    meta_path = os.path.join(rollup_path, META_NAME)
    old: dict[str, str] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            old = json.load(f)

    changed = sorted(c for c, fp in fps.items() if old.get(c) != fp)
    removed = sorted(c for c in old if c not in fps)

    for c in changed:
        part = (
            spark.read.parquet(hypertable_path)
            .where(F.col("__chunk") == c)
            .groupBy(
                F.col("__chunk"),
                F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
                F.col(key_col),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                # cast keeps the written schema identical to read_rollup's
                # zero-chunk fallback ('sum_value double') even when
                # value_col is integral (sum would otherwise be bigint)
                F.sum(F.col(value_col)).cast("double").alias("sum_value"),
            )
        )
        (
            part.drop("__chunk")
            .write.mode("overwrite")
            .parquet(os.path.join(rollup_path, f"__chunk={c}"))
        )
    for c in removed:
        shutil.rmtree(os.path.join(rollup_path, f"__chunk={c}"),
                      ignore_errors=True)

    os.makedirs(rollup_path, exist_ok=True)
    with open(meta_path, "w") as f:
        json.dump(fps, f)
    return changed


def read_rollup(spark: SparkSession, rollup_path: str,
                key_col: str = "event_type") -> DataFrame:
    """The rollup as a DataFrame (partitioned scan; ``__chunk`` column
    restored from the directory layout). A rollup with zero chunks (empty
    hypertable, or refreshed before any data landed) reads as an EMPTY
    frame with the standard schema instead of a path error."""
    has_chunks = os.path.isdir(rollup_path) and any(
        n.startswith("__chunk=") for n in os.listdir(rollup_path)
    )
    if not has_chunks:
        return spark.createDataFrame(
            [],
            f"bucket timestamp, {key_col} string, n bigint, "
            f"sum_value double, __chunk string",
        )
    return spark.read.option("basePath", rollup_path).parquet(
        os.path.join(rollup_path, "__chunk=*")
    )
