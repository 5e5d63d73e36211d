"""Multimodal operator queries (driver L3 mandate): binary media columns
with typed metadata, decode/featurize/resize/frame-sample as Arrow-batched
``mapInPandas`` stages.

All rows-only: the asset payloads are engine-generated REAL media binaries
(uncompressed BMP images, PCM WAV audio, RVID raw video — no media fixture
tables exist, and DuckDB has no twin for the decode plumbing).
Deterministic correctness is pinned by tests/test_multimodal.py; the asset
table itself derives 1:1 from `documents`, so row counts scale with SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hadoop_sync_spark.multimodal import (
    assets_from_documents,
    extract_features,
    resize_images,
    sample_frames,
)
from hadoop_sync_spark.queries import register


@register(
    "q90_media_features",
    oracle=None,
    tags=("multimodal", "mapInPandas", "features"),
)
def q90_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + featurize every asset through the Arrow batch path —
    REAL decoding (pure-numpy BMP/WAV/RVID codecs; pixel/sample stats,
    entropy) — then aggregate per media type.  Compressed formats remain
    multimodal.decode_real's marked import-try seam."""
    feats = extract_features(assets_from_documents(spark, sf_dir))
    return (
        feats.groupBy("media_type")
        .agg(
            F.count("*").alias("asset_cnt"),
            F.sum("payload_bytes").alias("total_bytes"),
            F.min("decoded_width").alias("min_w"),
            F.max("decoded_width").alias("max_w"),
        )
        .orderBy("media_type")
    )


@register(
    "q91_image_resize",
    oracle=None,
    tags=("multimodal", "mapInPandas", "resize"),
)
def q91_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch image resize to 32×32 — real nearest-neighbor resampling of
    decoded BMP pixels, re-encoded as BMP.  The media-type filter stays
    JVM-side ahead of the Python stage, so audio/video payloads never
    cross the Arrow boundary."""
    out = resize_images(assets_from_documents(spark, sf_dir), 32, 32)
    return out.select(
        "asset_id", "width", "height", F.length("content").alias("content_bytes")
    ).orderBy("asset_id")


@register(
    "q92_frame_sample",
    oracle=None,
    tags=("multimodal", "mapInPandas", "video"),
)
def q92_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling for video assets — the decode-then-explode
    pattern (one input row → many frame rows) inside a single mapInPandas
    stage, keeping the frame fan-out off the driver."""
    return sample_frames(assets_from_documents(spark, sf_dir), every_k=4).orderBy(
        "asset_id", "frame_no"
    )
