"""Partition selectors (P5): metadata -> partition index.

Reference: ``selector.selectPartitionFor(metadata, requested)``; default
is round-robin, an explicit request is honored mod N
(/root/reference/src/MofkaProducer.cpp:70-71,
/root/reference/src/DefaultPartitionSelector.hpp:25-37).

Spark form: a selector is also expressible as a Column over the metadata
JSON (hash/key-based selection) so bulk ingest can repartition
declaratively — `repartition(n, expr)` — instead of per-row python.
"""

from __future__ import annotations

import json
import zlib
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from mofka_spark.errors import MofkaError


class PartitionSelector:
    """Round-robin default."""

    def __init__(self) -> None:
        self._next = 0
        self.num_partitions = 1

    def set_partitions(self, n: int) -> None:
        self.num_partitions = max(1, n)

    def select(self, metadata: dict[str, Any], requested: int | None = None) -> int:
        if requested is not None:
            return requested % self.num_partitions
        p = self._next % self.num_partitions
        self._next += 1
        return p

    def to_column(self, metadata: Column | str = "metadata", seq: Column | str = "seq") -> Column:
        """Bulk form: even spread = hash(seq) mod N.

        NOT plain ``seq mod N``: the bulk seq is
        monotonically_increasing_id, whose value is
        (task_id << 33) + row_in_task — every task's block starts at a
        multiple of 2^33, so for any N dividing 2^33 (every power of
        two) ``seq % N`` only ever hits residues 0..rows_per_task-1.
        On a 256-partition topic with 128-row tasks, half the
        partitions would never receive a row. Hashing first restores
        the round-robin OBSERVABLE (even spread, no key affinity) at
        any task geometry; strict per-row cycling remains the property
        of the per-event path (``select``)."""
        s = F.col(seq) if isinstance(seq, str) else seq
        return F.pmod(F.xxhash64(s), F.lit(self.num_partitions)).cast("int")

    @staticmethod
    def from_metadata(config: dict[str, Any]) -> "PartitionSelector":
        t = config.get("type", "default")
        if t == "default":
            return PartitionSelector()
        if t == "key_hash":
            return KeyHashSelector(config["field"])
        raise MofkaError(f"unknown selector type {t!r}")


class KeyHashSelector(PartitionSelector):
    """Deterministic hash of a metadata field -> partition.

    Uses crc32 python-side and a matching expression Spark-side so both
    paths agree: partition = crc32(utf8(value)) % N. crc32 exists as a
    built-in in Spark (F.crc32), making the bulk path JVM-only.
    """

    def __init__(self, field: str):
        super().__init__()
        self.field = field

    def select(self, metadata: dict[str, Any], requested: int | None = None) -> int:
        if requested is not None:
            return requested % self.num_partitions
        v = metadata.get(self.field)
        # compact separators match Spark's get_json_object rendering of
        # nested values, so both paths hash identical bytes
        key = v if isinstance(v, str) else json.dumps(v, separators=(",", ":"))
        return zlib.crc32(key.encode("utf-8")) % self.num_partitions

    def to_column(self, metadata: Column | str = "metadata", seq: Column | str = "seq") -> Column:
        col = F.col(metadata) if isinstance(metadata, str) else metadata
        # a missing field yields NULL from get_json_object; hash the
        # string "null" instead (matching json.dumps(None) on the python
        # path) — otherwise crc32(NULL) % N is NULL and downstream
        # F.create_map in append_batch dies on a NULL map key
        v = F.coalesce(F.get_json_object(col, f"$.{self.field}"), F.lit("null"))
        return F.pmod(F.crc32(v.cast("binary")), F.lit(self.num_partitions)).cast("int")
