"""Multimodal asset plumbing: image/audio/video as opaque binary columns.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (:func:`decode_asset` raises ``NotImplementedError``
unless ``fake=True`` selects the deterministic fake decoder). Everything
Spark-side is real and tested: the asset schema, Arrow-batched
``mapInPandas`` feature extraction (batch in, batch out — the shape a
real libjpeg/ffmpeg UDF would keep), and partition-size-aware batching.

Scale design: assets are *large values, small keys*. Feature extraction
is a narrow map (no shuffle); the output drops the payload so downstream
stages shuffle only features + metadata. At 100 TB of payload that is
the difference between a runnable job and an impossible one.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),          # image | audio | video
        StructField("payload", BinaryType(), False),        # opaque encoded bytes
        StructField("width", IntegerType(), True),          # typed metadata
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(DoubleType()), False),  # 16-dim
    ]
)


def make_assets_table(spark: SparkSession, n_rows: int, *, seed: int = 42) -> DataFrame:
    """Deterministic fake assets: payload bytes are a splitmix stream keyed
    by asset_id — stable across parallelism levels (like synth.py)."""
    base = spark.range(0, n_rows, 1, max(1, spark.sparkContext.defaultParallelism))

    def gen(pdfs: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = np.array(["image", "audio", "video"])
        for pdf in pdfs:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            if ids.size == 0:
                continue
            rows = []
            for i in ids:
                rng = np.random.default_rng(np.uint64(seed) * np.uint64(7919) + np.uint64(i))
                size = int(rng.integers(64, 4096))
                kind = kinds[i % 3]
                rows.append(
                    {
                        "asset_id": int(i),
                        "kind": str(kind),
                        "payload": rng.integers(0, 256, size, dtype=np.uint8).tobytes(),
                        "width": int(rng.integers(16, 512)) if kind == "image" else None,
                        "height": int(rng.integers(16, 512)) if kind == "image" else None,
                        "sample_rate": 16_000 if kind == "audio" else None,
                        "n_frames": int(rng.integers(1, 300)) if kind == "video" else None,
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, ASSET_SCHEMA)


def decode_asset(payload: bytes, kind: str, *, fake: bool = False) -> np.ndarray:
    """Decode an encoded asset to a raw sample array.

    STUB: real decoding needs libjpeg/libsndfile/ffmpeg, not present in
    this container. ``fake=True`` returns the payload bytes as uint8 —
    deterministic, so the pipeline around it is fully testable.
    """
    if not fake:
        raise NotImplementedError(
            f"{kind} decoding requires media codecs not available here; "
            "pass fake=True for the deterministic byte-stream fake"
        )
    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(assets: DataFrame, *, fake_decode: bool = True) -> DataFrame:
    """16-bin byte-histogram features per asset via Arrow-batched mapInPandas.

    The UDF receives whole Arrow batches of (asset_id, kind, payload) and
    vectorizes over the batch — the exact plumbing a real decoder would
    use (swap the histogram for jpeg-decode + pooling). Payload is dropped
    from the output: only 16 doubles + metadata flow downstream.
    """

    def feat(pdfs: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if pdf.empty:
                continue
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = decode_asset(payload, kind, fake=fake_decode)
                hist = np.bincount(raw >> 4, minlength=16).astype(np.float64)
                total = hist.sum() or 1.0
                feats.append(hist / total)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": feats,
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(feat, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index — pure
    built-ins (sequence + explode), no payload movement; the decode of the
    chosen frames would be a later mapInPandas over (asset_id, frame_idx)."""
    vids = assets.where(F.col("kind") == "video").select(
        "asset_id", "n_frames"
    )
    return vids.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
