"""Structured Streaming pipeline: the reference job, Spark-first."""

from flink_clickstream_processor_msk_spark.streaming.pipeline import build_streams

__all__ = ["build_streams"]
