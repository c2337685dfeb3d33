"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing is REAL — schemas, partition-stable batch iteration,
Arrow batch shapes, error rows — while the codec step is stubbed behind a
deterministic fake (the sandbox has no image/audio libraries; swap
``_decode_stub`` for PIL/torchaudio/pyav in production — the mapInPandas
signature and output schema do not change).

Design notes for 100 TB:
- media bytes ride in parquet binary columns; metadata (modality, codec,
  dims) in sibling columns so filters prune WITHOUT touching bytes
  (column pruning keeps the scan cheap — check ReadSchema in .explain);
- all per-item work is ``mapInPandas`` (Arrow-batched, one python worker
  per core, no per-row pickling); batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep peak memory flat;
- failures become error rows, not task failures — a poisoned item cannot
  kill a 10^12-item job.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "item_id long, modality string, codec string, width int, height int, "
    "duration_ms int, data binary"
)

FEATURE_SCHEMA = (
    "item_id long, ok boolean, error string, feat array<float>, "
    "out_width int, out_height int"
)


def synth_media(spark, n: int = 64, parts: int = 4) -> DataFrame:
    """Deterministic fake media table (bytes = seeded hash stream)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                h = hashlib.sha256(f"media:{i}".encode()).digest()
                rows.append(
                    {
                        "item_id": int(i),
                        "modality": ["image", "audio", "video"][int(i) % 3],
                        "codec": ["png", "wav", "mp4"][int(i) % 3],
                        "width": 64 + int(i) % 64,
                        "height": 48 + int(i) % 48,
                        "duration_ms": int(i) * 100,
                        "data": h * 4,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, parts).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_stub(data: bytes, codec: str) -> np.ndarray:
    """STUB: stands in for a real decoder (PIL.Image.open / torchaudio.load /
    pyav frame sampling). Deterministic: derives a pseudo-signal from the
    bytes so downstream feature shapes and values are test-stable. The
    payload is hex-encoded before hashing so a pure-SQL oracle (DuckDB has
    VARCHAR-only hash functions) can recompute the signal independently.
    Raises on empty payloads to exercise the error path."""
    if not data:
        raise ValueError("empty payload")
    arr = np.frombuffer(
        hashlib.sha256(data.hex().encode()).digest(), dtype=np.uint8
    )
    return arr.astype(np.float32) / 255.0


def extract_features(
    media: DataFrame, target: tuple[int, int] = (16, 16), feat_dim: int = 8
) -> DataFrame:
    """Decode → "resize" → feature-extract, Arrow-batched.

    Output: one row per item with ``ok``/``error`` status, a ``feat_dim``
    float feature vector, and the post-resize dimensions.
    """
    tw, th = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                try:
                    sig = _decode_stub(row["data"], row["codec"])
                    # "resize": average-pool the pseudo-signal to feat_dim
                    chunks = np.array_split(sig, feat_dim)
                    feat = np.array([float(c.mean()) for c in chunks],
                                    dtype=np.float32)
                    out.append(
                        {"item_id": row["item_id"], "ok": True, "error": None,
                         "feat": feat.tolist(), "out_width": tw, "out_height": th}
                    )
                except Exception as exc:  # error row, never a task failure
                    out.append(
                        {"item_id": row["item_id"], "ok": False,
                         "error": f"{type(exc).__name__}: {exc}",
                         "feat": None, "out_width": None, "out_height": None}
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → sampled frame timestamps (plumbing for pyav frame sampling:
    one output row per sampled frame, exploded JVM-side so the python stage
    only computes per-frame payloads)."""
    return (
        media.where(F.col("modality") == "video")
        .select(
            "item_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )
