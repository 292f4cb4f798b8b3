"""Multimodal (image/audio/video) column plumbing.

Binary media are opaque ``binary`` columns with typed metadata; the
decode / feature-extract / resize / frame-sample operators are Arrow-
batched ``mapInPandas`` stages.  The actual media codecs are NOT
available in this environment, so the decode step is STUBBED: with
``fake=True`` (default) a deterministic synthetic decoder derived from
the payload bytes stands in (so schemas, batching, partitioning and
downstream math are fully real and testable); with ``fake=False`` the
codec boundary raises ``NotImplementedError`` where a real library
(Pillow/ffmpeg/soundfile) would be invoked.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, width int, "
                "height int, sample_rate int, n_frames int")


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = hash-derived bytes)."""
    df = spark.range(0, n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.pmod("id", F.lit(3)) + 1).cast("int")).alias("kind"),
        F.sha2(F.concat(F.lit(f"m{seed}:"), F.col("id").cast("string")), 256)
         .cast("binary").alias("payload"),
        F.lit(32).alias("width"), F.lit(24).alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod("id", F.lit(7)) + 3).cast("int").alias("n_frames"),
    )
    return df


def _fake_decode(payload: bytes, n_values: int) -> np.ndarray:
    """Deterministic stand-in decoder: stretch a seed digest into
    ``n_values`` floats in [0, 1)."""
    out = np.empty(n_values)
    i = 0
    ctr = 0
    while i < n_values:
        h = hashlib.sha256(payload + ctr.to_bytes(4, "big")).digest()
        block = np.frombuffer(h, dtype=np.uint8).astype(np.float64) / 256.0
        take = min(len(block), n_values - i)
        out[i:i + take] = block[:take]
        i += take
        ctr += 1
    return out


def decode_features(media: DataFrame, n_features: int = 16,
                    fake: bool = True) -> DataFrame:
    """media → fixed-width feature vectors (the embedding-extraction
    stage of a training-data pipeline).  Batched: one pandas frame per
    Arrow batch, one numpy matrix per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires Pillow/ffmpeg/soundfile, "
                    "not available in this environment")
            feats = [
                _fake_decode(bytes(p), n_features).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "features": feats})

    return media.mapInPandas(
        run, schema="media_id long, kind string, features array<double>")


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 6,
                  fake: bool = True) -> DataFrame:
    """Image resize stage: decode → (h, w) float array → area-average
    downsample → flattened pixels.  Real Spark plumbing, stubbed codec."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                if row.kind != "image":
                    continue
                if not fake:
                    raise NotImplementedError("real image decode unavailable")
                img = _fake_decode(bytes(row.payload),
                                   row.width * row.height).reshape(
                    row.height, row.width)
                fy, fx = row.height // out_h, row.width // out_w
                small = img[:out_h * fy, :out_w * fx] \
                    .reshape(out_h, fy, out_w, fx).mean(axis=(1, 3))
                rows.append((row.media_id, out_w, out_h,
                             small.ravel().tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "out_w", "out_h",
                                              "pixels"])

    return media.mapInPandas(
        run, schema="media_id long, out_w int, out_h int, pixels array<double>")


def sample_frames(media: DataFrame, every_k: int = 2,
                  fake: bool = True) -> DataFrame:
    """Video frame-sampling stage: one output row per kept frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                if row.kind != "video":
                    continue
                for fi in range(0, int(row.n_frames), every_k):
                    if not fake:
                        raise NotImplementedError("real video decode unavailable")
                    frame_sig = float(_fake_decode(
                        bytes(row.payload) + fi.to_bytes(2, "big"), 1)[0])
                    rows.append((row.media_id, fi, frame_sig))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "frame_sig"])

    return media.mapInPandas(
        run, schema="media_id long, frame_idx int, frame_sig double")
