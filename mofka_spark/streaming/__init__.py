"""Structured Streaming integration: topic readStream/writeStream."""

from mofka_spark.streaming.sink import topic_sink
from mofka_spark.streaming.source import MofkaDataSource

__all__ = ["MofkaDataSource", "topic_sink"]
