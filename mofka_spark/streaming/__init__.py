"""Structured Streaming integration: topic readStream/writeStream."""

from mofka_spark.streaming.annindex import (
    ann_index_sink,
    compact_index,
    search_index,
)
from mofka_spark.streaming.neardup import (
    compact_store,
    neardup_sink,
    read_result,
)
from mofka_spark.streaming.sink import topic_sink
from mofka_spark.streaming.source import MofkaDataSource

__all__ = [
    "MofkaDataSource",
    "ann_index_sink",
    "compact_index",
    "compact_store",
    "neardup_sink",
    "read_result",
    "search_index",
    "topic_sink",
]
