"""Structured Streaming integration: topic readStream/writeStream."""

from mofka_spark.streaming.neardup import neardup_sink, read_result
from mofka_spark.streaming.sink import topic_sink
from mofka_spark.streaming.source import MofkaDataSource

__all__ = ["MofkaDataSource", "neardup_sink", "read_result", "topic_sink"]
