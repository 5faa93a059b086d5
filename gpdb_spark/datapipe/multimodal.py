"""Multimodal (binary) column plumbing: image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
pandas UDFs via mapInPandas.

Beyond-reference capability. The Spark-side contract is fully real —
schema, partitioning, batch iteration, UDF signatures; only the media
*decode* step is stubbed (no image/audio libs in this container): decode
functions raise NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder (byte-histogram-seeded) stands in so the
pipeline shape is testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

BYTES_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("entropy", DoubleType()),
        # floor(entropy * 1000) from the UNROUNDED value: an integer an
        # independent engine can reproduce without FP-rounding-mode
        # agreement (the cross-engine comparison column)
        StructField("entropy_milli", LongType()),
        StructField("histogram16", ArrayType(LongType())),
    ]
)


def attach_binary(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a media-shaped frame from the documents fixture: payload =
    utf-8 bytes standing in for an encoded image/audio blob."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").cast(BinaryType()).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
    )


def byte_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: byte count,
    Shannon entropy, 16-bin byte histogram. Real numpy math over real
    bytes — the exact plumbing a media featurizer needs (decode is the
    only stub, see ``decode_image``)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                if arr.size:
                    counts = np.bincount(arr, minlength=256).astype(np.float64)
                    p = counts[counts > 0] / arr.size
                    entropy = float(-(p * np.log2(p)).sum())
                    hist16 = counts.reshape(16, 16).sum(axis=1).astype(np.int64)
                else:
                    entropy, hist16 = 0.0, np.zeros(16, dtype=np.int64)
                out.append(
                    (
                        int(mid),
                        int(arr.size),
                        round(entropy, 6),
                        int(np.floor(entropy * 1000.0)),
                        hist16.tolist(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "n_bytes",
                    "entropy",
                    "entropy_milli",
                    "histogram16",
                ],
            )

    return df.mapInPandas(_stats, BYTES_STATS_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an encoded image to HxWx3 uint8.

    STUB: real decode needs an image library not present in this
    container. ``fake=True`` returns a deterministic 8x8x3 array seeded
    from the payload bytes so downstream plumbing (resize / embed) is
    testable."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an image library (e.g. Pillow) not "
            "available in this environment; pass fake=True for the "
            "deterministic test double"
        )
    arr = np.frombuffer(payload[:192] if payload else b"\0" * 192, dtype=np.uint8)
    arr = np.resize(arr, 192)
    return arr.reshape(8, 8, 3)


def resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize of an HxWxC array — REAL image math (pure
    index sampling, no media lib needed): out[r,c] = in[r*H//h, c*W//w].
    This is the resize step of the decode→resize→featurize pipeline;
    only the codec decode itself is a stub."""
    H, W = img.shape[:2]
    ri = (np.arange(h) * H) // h
    ci = (np.arange(w) * W) // w
    return img[ri][:, ci]


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        # per-channel mean of the 4x4 nearest-resized image, as exact
        # milli-scaled integers ((sum*1000) // 16 — cross-engine safe)
        StructField("mean_r_milli", LongType()),
        StructField("mean_g_milli", LongType()),
        StructField("mean_b_milli", LongType()),
        StructField("pixel_checksum", LongType()),
    ]
)


def image_features(
    df: DataFrame, payload_col: str = "payload", out_hw: tuple[int, int] = (4, 4)
) -> DataFrame:
    """decode (deterministic fake) → resize_nearest → per-channel
    features, Arrow-batched via mapInPandas — the full image-pipeline
    plumbing with real schema/batching/math end to end. Because the
    fake decoder is a pure function of the payload bytes (first 192
    bytes tiled into 8x8x3), every feature is re-derivable by an
    independent engine from the same bytes: the whole path is
    oracle-checkable, not just smoke-tested."""
    h, w = out_hw

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                img = decode_image(bytes(payload or b""), fake=True)
                small = resize_nearest(img, h, w).astype(np.int64)
                sums = small.reshape(-1, 3).sum(axis=0)
                n_px = h * w
                out.append(
                    (
                        int(mid),
                        int(sums[0] * 1000) // n_px,
                        int(sums[1] * 1000) // n_px,
                        int(sums[2] * 1000) // n_px,
                        int(small.sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "mean_r_milli",
                    "mean_g_milli",
                    "mean_b_milli",
                    "pixel_checksum",
                ],
            )

    return df.mapInPandas(_feats, IMAGE_FEATURES_SCHEMA)


def frame_sample_times(duration_s: float, fps: float = 1.0) -> list[float]:
    """Deterministic frame-sampling schedule for a video payload (the
    metadata-side half of frame extraction; decode itself is stubbed)."""
    if duration_s <= 0:
        return []
    n = int(duration_s * fps)
    return [round(i / fps, 3) for i in range(n)]


def frame_manifest(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "n_bytes",
    bytes_per_s: int = 100,
    fps: int = 2,
) -> DataFrame:
    """Video frame-extraction MANIFEST: one row per frame to decode —
    (media_id, frame_idx, t_centis). Duration is derived from payload
    size (bytes_per_s stands in for the container's bitrate metadata);
    the schedule is pure JVM (sequence→explode, zero shuffle), the
    per-frame decode is the stubbed step a real deployment plugs in.
    Times are exact centisecond integers with integer fps arithmetic —
    engine-reproducible."""
    if 100 % fps:
        raise ValueError("fps must divide 100 for exact centisecond times")
    n_frames = F.expr(f"CAST(({bytes_col} * {fps}) DIV {bytes_per_s} AS INT)")
    d = df.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                n_frames > 0, F.sequence(F.lit(0), n_frames - 1)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("__p", "frame_idx"),
    )
    return d.select(
        id_col,
        "frame_idx",
        (F.col("frame_idx") * (100 // fps)).cast("long").alias("t_centis"),
    )
