"""Structured Streaming integration: topic readStream/writeStream."""

from mofka_spark.streaming.annindex import ann_index_sink, search_index
from mofka_spark.streaming.neardup import neardup_sink, read_result
from mofka_spark.streaming.sink import topic_sink
from mofka_spark.streaming.source import MofkaDataSource

__all__ = [
    "MofkaDataSource",
    "ann_index_sink",
    "neardup_sink",
    "read_result",
    "search_index",
    "topic_sink",
]
