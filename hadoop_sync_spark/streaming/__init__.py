"""Structured Streaming surface: the reference's incremental file-arrival
model (`README.md:10-13`) as continuous pipelines (SURVEY §2C)."""

from hadoop_sync_spark.streaming.pipeline import (  # noqa: F401
    attribution_join,
    dedup_stream,
    dedup_stream_within_watermark,
    sessionized,
    sessionized_with_state,
    stream_events,
    windowed_counts,
)
