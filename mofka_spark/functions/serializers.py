"""Metadata serializers (P6).

Reference: ``serializer.serialize(archive, metadata)`` packs each event's
metadata into the batch buffer; inverse on the consumer
(/root/reference/src/ProducerBatch.hpp:87-99,
/root/reference/src/MofkaConsumer.cpp:193-199). Default is the JSON
string rendering.

Spark form: the log stores metadata as a canonical JSON string column;
"serialization" maps to to_json/from_json at the engine boundary, and
Parquet+Arrow replace the custom sizes+concat wire format (P11) — the
reference's `[N sizes] ++ [content]` layout IS Arrow's BinaryArray
offsets+values layout.
"""

from __future__ import annotations

import json
from typing import Any

from mofka_spark.errors import MofkaError


class Serializer:
    """Canonical-JSON serializer (type=default)."""

    def serialize(self, metadata: dict[str, Any]) -> str:
        return json.dumps(metadata, sort_keys=True, separators=(",", ":"))

    def deserialize(self, payload: str) -> dict[str, Any]:
        return json.loads(payload)

    @staticmethod
    def from_metadata(config: dict[str, Any]) -> "Serializer":
        t = config.get("type", "default")
        if t in ("default", "json"):
            return Serializer()
        if t == "compact":
            return CompactSerializer(config.get("fields") or [])
        raise MofkaError(f"unknown serializer type {t!r}")


class CompactSerializer(Serializer):
    """Property-list serializer: stores only the configured fields, in
    order, as a JSON array — the analog of schema-aware compact encodings.
    Lossy by design for unlisted fields."""

    def __init__(self, fields: list[str]):
        self.fields = list(fields)

    def serialize(self, metadata: dict[str, Any]) -> str:
        return json.dumps([metadata.get(f) for f in self.fields], separators=(",", ":"))

    def deserialize(self, payload: str) -> dict[str, Any]:
        vals = json.loads(payload)
        return dict(zip(self.fields, vals))
