"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Binary media live as opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` — the plumbing (schemas, batching,
partitioning) is real and tested. The actual codec is STUBBED: this
container has no image/audio libraries, so ``decode_fn="fake"`` derives a
deterministic pixel/sample buffer from the content hash, and
``decode_fn="real"`` raises ``NotImplementedError`` where a PIL/ffmpeg call
would plug in.

Scale design: media blobs never shuffle — every stage is mapInPandas over
the scan partitioning; only extracted features (small fixed-size vectors)
flow into joins/aggregations downstream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("id bigint, content binary, format string, "
                "width int, height int, n_frames int")

_DECODED_SCHEMA = ("id bigint, frame int, width int, height int, "
                   "pixels array<int>")
_FEATURE_SCHEMA = ("id bigint, frame int, mean_px double, std_px double, "
                   "p_low double, p_high double")


def synthesize_media(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n_frames: int = 1,
                     width: int = 16, height: int = 16) -> DataFrame:
    """Deterministic binary media column from any string column (test
    harness for the pipeline; real deployments read binary parquet)."""
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("fake/raw").alias("format"),
        F.lit(width).alias("width"), F.lit(height).alias("height"),
        F.lit(n_frames).alias("n_frames"))


def _fake_decode(content: bytes, frame: int, width: int, height: int) -> np.ndarray:
    """hash-seeded deterministic 'pixels' (uint8)."""
    seed = hashlib.sha256(content + frame.to_bytes(4, "little")).digest()
    rng = np.random.default_rng(int.from_bytes(seed[:8], "little"))
    return rng.integers(0, 256, size=width * height, dtype=np.int64)


def decode_media(df: DataFrame, decode_fn: str = "fake",
                 sample_every: int = 1) -> DataFrame:
    """content -> per-frame pixel rows; ``sample_every`` keeps every n-th
    frame (video frame sampling)."""
    if decode_fn not in ("fake", "real"):
        raise ValueError(decode_fn)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if decode_fn == "real":
                    raise NotImplementedError(
                        "real media decoding needs PIL/ffmpeg; plug in here")
                for frame in range(0, int(r["n_frames"]), sample_every):
                    px = _fake_decode(bytes(r["content"]), frame,
                                      int(r["width"]), int(r["height"]))
                    rows.append((int(r["id"]), frame, int(r["width"]),
                                 int(r["height"]), px.tolist()))
            yield pd.DataFrame(rows, columns=["id", "frame", "width",
                                              "height", "pixels"])

    return df.mapInPandas(gen, schema=_DECODED_SCHEMA)


def resize_pixels(df: DataFrame, factor: int = 2) -> DataFrame:
    """average-pool downsample by ``factor`` (deterministic integer mean)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h = int(r["width"]), int(r["height"])
                px = np.asarray(r["pixels"], dtype=np.int64).reshape(h, w)
                h2, w2 = h // factor, w // factor
                pooled = px[:h2 * factor, :w2 * factor].reshape(
                    h2, factor, w2, factor).sum(axis=(1, 3)) // (factor * factor)
                rows.append((int(r["id"]), int(r["frame"]), w2, h2,
                             pooled.reshape(-1).tolist()))
            yield pd.DataFrame(rows, columns=["id", "frame", "width",
                                              "height", "pixels"])
    return df.mapInPandas(gen, schema=_DECODED_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """fixed-size per-frame features (exact integer-derived statistics)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                px = np.asarray(r["pixels"], dtype=np.int64)
                n = len(px)
                mean = float(px.sum()) / n
                var = float((px * px).sum()) / n - mean * mean
                rows.append((int(r["id"]), int(r["frame"]), mean,
                             float(np.sqrt(max(var, 0.0))),
                             float((px < 64).sum()) / n,
                             float((px >= 192).sum()) / n))
            yield pd.DataFrame(rows, columns=["id", "frame", "mean_px",
                                              "std_px", "p_low", "p_high"])
    return df.mapInPandas(gen, schema=_FEATURE_SCHEMA)
