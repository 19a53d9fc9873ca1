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
        if t == "avro":
            return AvroSerializer(config.get("schema") or {})
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

class AvroSerializer(Serializer):
    """Avro binary serializer (SURVEY.md P6's schema'd option).

    Spec-conformant Avro *binary encoding* (Apache Avro 1.11
    specification, "Binary encoding" section), implemented directly —
    zigzag-varint ints/longs, length-prefixed UTF-8 strings/bytes,
    little-endian IEEE floats, block-encoded arrays/maps, index-prefixed
    unions, field-order records — so payloads interoperate with any
    Avro reader given the same schema. No codec library needed.

    Config: ``{"type": "avro", "schema": {...Avro JSON schema, type
    record...}}``. The metadata column stays a string (base64 of the
    binary body), matching the engine's storage contract.

    Supported schema subset: null, boolean, int, long, float, double,
    string, bytes, record, enum, fixed, array, map, union. (No
    aliases/logical-type resolution — writer schema == reader schema,
    which is the topic-validator contract anyway.)
    """

    def __init__(self, schema: dict[str, Any]):
        if not isinstance(schema, dict) or schema.get("type") != "record":
            raise MofkaError("avro serializer requires a record schema")
        if not schema.get("fields"):
            raise MofkaError("avro record schema has no fields")
        self.schema = schema

    # -- encoding primitives ------------------------------------------------

    @staticmethod
    def _zigzag(n: int) -> int:
        return (n << 1) ^ (n >> 63)

    @staticmethod
    def _unzigzag(n: int) -> int:
        return (n >> 1) ^ -(n & 1)

    @classmethod
    def _write_long(cls, out: bytearray, n: int) -> None:
        z = cls._zigzag(int(n)) & 0xFFFFFFFFFFFFFFFF
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                return

    @classmethod
    def _read_long(cls, raw: bytes, pos: int) -> tuple[int, int]:
        shift, acc = 0, 0
        while True:
            b = raw[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                return cls._unzigzag(acc), pos
            shift += 7

    # -- schema-driven encode/decode ---------------------------------------

    def _encode(self, out: bytearray, schema: Any, v: Any) -> None:
        import struct as _s

        if isinstance(schema, list):  # union: index, then value
            idx = self._union_index(schema, v)
            self._write_long(out, idx)
            self._encode(out, schema[idx], v)
            return
        t = schema["type"] if isinstance(schema, dict) else schema
        if t == "null":
            if v is not None:
                raise MofkaError(f"avro: expected null, got {v!r}")
        elif t == "boolean":
            out.append(1 if v else 0)
        elif t in ("int", "long"):
            self._write_long(out, v)
        elif t == "float":
            out += _s.pack("<f", float(v))
        elif t == "double":
            out += _s.pack("<d", float(v))
        elif t == "string":
            b = str(v).encode("utf-8")
            self._write_long(out, len(b))
            out += b
        elif t == "bytes":
            b = bytes(v)
            self._write_long(out, len(b))
            out += b
        elif t == "record":
            for f in schema["fields"]:
                self._encode(out, f["type"], (v or {}).get(f["name"]))
        elif t == "enum":
            try:
                self._write_long(out, schema["symbols"].index(v))
            except ValueError:
                raise MofkaError(f"avro: {v!r} not in enum {schema.get('name')}")
        elif t == "fixed":
            b = bytes(v)
            if len(b) != schema["size"]:
                raise MofkaError("avro: fixed size mismatch")
            out += b
        elif t == "array":
            items = list(v or [])
            if items:
                self._write_long(out, len(items))
                for item in items:
                    self._encode(out, schema["items"], item)
            self._write_long(out, 0)
        elif t == "map":
            entries = dict(v or {})
            if entries:
                self._write_long(out, len(entries))
                for k, item in entries.items():
                    kb = str(k).encode("utf-8")
                    self._write_long(out, len(kb))
                    out += kb
                    self._encode(out, schema["values"], item)
            self._write_long(out, 0)
        else:
            raise MofkaError(f"avro: unsupported type {t!r}")

    def _union_index(self, branches: list, v: Any) -> int:
        def name_of(b):
            return b["type"] if isinstance(b, dict) else b

        if v is None:
            for i, b in enumerate(branches):
                if name_of(b) == "null":
                    return i
        tags = {
            bool: ("boolean",),
            int: ("long", "int"),
            float: ("double", "float"),
            str: ("string", "enum"),
            bytes: ("bytes", "fixed"),
            dict: ("record", "map"),
            list: ("array",),
        }
        for want in tags.get(type(v), ()):
            for i, b in enumerate(branches):
                if name_of(b) == want:
                    return i
        raise MofkaError(f"avro: no union branch for {type(v).__name__}")

    def _decode(self, raw: bytes, pos: int, schema: Any) -> tuple[Any, int]:
        import struct as _s

        if isinstance(schema, list):
            idx, pos = self._read_long(raw, pos)
            return self._decode(raw, pos, schema[idx])
        t = schema["type"] if isinstance(schema, dict) else schema
        if t == "null":
            return None, pos
        if t == "boolean":
            return bool(raw[pos]), pos + 1
        if t in ("int", "long"):
            return self._read_long(raw, pos)
        if t == "float":
            return _s.unpack_from("<f", raw, pos)[0], pos + 4
        if t == "double":
            return _s.unpack_from("<d", raw, pos)[0], pos + 8
        if t in ("string", "bytes"):
            n, pos = self._read_long(raw, pos)
            b = raw[pos : pos + n]
            return (b.decode("utf-8") if t == "string" else b), pos + n
        if t == "record":
            doc = {}
            for f in schema["fields"]:
                doc[f["name"]], pos = self._decode(raw, pos, f["type"])
            return doc, pos
        if t == "enum":
            idx, pos = self._read_long(raw, pos)
            return schema["symbols"][idx], pos
        if t == "fixed":
            n = schema["size"]
            return raw[pos : pos + n], pos + n
        if t == "array":
            items = []
            while True:
                cnt, pos = self._read_long(raw, pos)
                if cnt == 0:
                    return items, pos
                if cnt < 0:  # block with byte-size prefix
                    cnt = -cnt
                    _, pos = self._read_long(raw, pos)
                for _ in range(cnt):
                    item, pos = self._decode(raw, pos, schema["items"])
                    items.append(item)
        if t == "map":
            entries = {}
            while True:
                cnt, pos = self._read_long(raw, pos)
                if cnt == 0:
                    return entries, pos
                if cnt < 0:
                    cnt = -cnt
                    _, pos = self._read_long(raw, pos)
                for _ in range(cnt):
                    n, pos = self._read_long(raw, pos)
                    k = raw[pos : pos + n].decode("utf-8")
                    pos += n
                    entries[k], pos = self._decode(raw, pos, schema["values"])
        raise MofkaError(f"avro: unsupported type {t!r}")

    # -- Serializer contract ------------------------------------------------

    def serialize(self, metadata: dict[str, Any]) -> str:
        import base64

        out = bytearray()
        self._encode(out, self.schema, metadata)
        return base64.b64encode(bytes(out)).decode("ascii")

    def deserialize(self, payload: str) -> dict[str, Any]:
        import base64

        raw = base64.b64decode(payload)
        doc, pos = self._decode(raw, 0, self.schema)
        if pos != len(raw):
            raise MofkaError("avro: trailing bytes in payload")
        return doc
