"""Compiled Column-expression functions: view algebra, eventbridge
patterns, validators, selectors, serializers, text/vector analytics."""

from mofka_spark.functions.views import DataDescriptor, select_bytes, slice_segments

__all__ = ["DataDescriptor", "select_bytes", "slice_segments"]
