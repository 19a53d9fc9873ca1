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
        if t == "packed":
            return PackedSerializer(config.get("fields") or [])
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


class PackedSerializer(Serializer):
    """Schema-typed binary serializer (the Avro-style property option,
    SURVEY.md P6, self-contained — no codec library needed).

    Config: ``{"type": "packed", "fields": [{"name": ..., "type":
    "long"|"double"|"bool"|"string"}, ...]}``. Values pack little-endian
    (strings length-prefixed UTF-8) with a per-field presence bit, then
    base64 — the metadata column stays a string. Lossy by design for
    unlisted fields, like any schema'd encoding.
    """

    _FIXED = {"long": ("<q", 8), "double": ("<d", 8), "bool": ("<?", 1)}

    def __init__(self, fields: list[dict[str, str]]):
        if not fields:
            raise MofkaError("packed serializer requires a fields list")
        self.fields = [(f["name"], f["type"]) for f in fields]
        for name, t in self.fields:
            if t not in self._FIXED and t != "string":
                raise MofkaError(f"packed serializer: unsupported type {t!r} for {name!r}")

    def serialize(self, metadata: dict[str, Any]) -> str:
        import base64
        import struct

        out = bytearray()
        for name, t in self.fields:
            v = metadata.get(name)
            if v is None:
                out += b"\x00"
                continue
            out += b"\x01"
            if t == "string":
                b = str(v).encode("utf-8")
                out += struct.pack("<I", len(b)) + b
            else:
                fmt, _ = self._FIXED[t]
                out += struct.pack(fmt, v)
        return base64.b64encode(bytes(out)).decode("ascii")

    def deserialize(self, payload: str) -> dict[str, Any]:
        import base64
        import struct

        raw = base64.b64decode(payload)
        pos = 0
        doc: dict[str, Any] = {}
        for name, t in self.fields:
            present = raw[pos]
            pos += 1
            if not present:
                continue
            if t == "string":
                (n,) = struct.unpack_from("<I", raw, pos)
                pos += 4
                doc[name] = raw[pos : pos + n].decode("utf-8")
                pos += n
            else:
                fmt, size = self._FIXED[t]
                (doc[name],) = struct.unpack_from(fmt, raw, pos)
                pos += size
        return doc
