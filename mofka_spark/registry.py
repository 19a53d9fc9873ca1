"""Topic registry — the control plane (DDL surface).

Reference parity (SURVEY.md S1-S4, S9, L8):
- createTopic persists validator/selector/serializer config and the
  partition list under a master database; duplicate -> error
  (/root/reference/src/MofkaDriver.cpp:151-315).
- openTopic loads the three configs + partitions
  (/root/reference/src/MofkaDriver.cpp:317-459).
- listTopics is a prefix scan (/root/reference/src/MofkaDriver.cpp:461-497).
- topic name limit 256 chars (/root/reference/src/MofkaDriver.cpp:157).
- markAsComplete persists a completion flag
  (/root/reference/src/YokanEventStore.hpp:335-345).

Spark-first design: the "master DB" is a directory of small JSON files
(one per topic) next to the data. At cluster scale this directory lives
on the shared filesystem / object store; registry operations are O(1)
driver-side metadata ops, never Spark jobs. The event data itself lives
in ``topics/<name>/partition=<p>/`` as Parquet so that Spark's partition
discovery + pruning give consumer partition-subset reads for free.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field
from typing import Any

from mofka_spark.errors import MofkaError, TopicExistsError, TopicNotFoundError

MAX_TOPIC_NAME_LEN = 256  # reference: src/MofkaDriver.cpp:157

DEFAULT_VALIDATOR = {"type": "default"}
DEFAULT_SELECTOR = {"type": "default"}  # round-robin (DefaultPartitionSelector.hpp:25-37)
DEFAULT_SERIALIZER = {"type": "default"}  # JSON string serializer


@dataclass
class TopicConfig:
    """Persisted per-topic configuration (the MOFKA:GLOBAL:<name>:* keys)."""

    name: str
    num_partitions: int = 1
    validator: dict[str, Any] = field(default_factory=lambda: dict(DEFAULT_VALIDATOR))
    selector: dict[str, Any] = field(default_factory=lambda: dict(DEFAULT_SELECTOR))
    serializer: dict[str, Any] = field(default_factory=lambda: dict(DEFAULT_SERIALIZER))
    completed: bool = False
    created_at: float = 0.0
    # S7 partition storage backend: "default" (partitioned Parquet) or
    # "memory" (in-process; see log.MemoryEventLog). The reference's
    # third ("legacy" Yokan+Warabi) collapses into "default" — both are
    # file-backed logs behind one interface.
    backend: str = "default"
    # S5 per-partition backend mix: the reference attaches a manager
    # TYPE per partition on one topic (memory/default/legacy,
    # /root/reference/src/MofkaDriver.cpp:510-643,
    # include/mofka/MofkaDriver.hpp:220-279). None = every partition
    # uses `backend`; else entry i is partition i's backend.
    partition_backends: list[str] | None = None
    # Write-through batch cache config for file-backed partitions
    # (reference default-partition-design.md §Write-Through Batch
    # Cache: {"enabled": bool, "max_batches": int,
    # "max_memory_bytes": int}). None = reference defaults (ENABLED,
    # 16 batches, 64 MiB). Validated at creation like the reference's
    # JSON-Schema check of the partition config.
    write_cache: dict[str, Any] | None = None
    # Free-form facade metadata (e.g. the Kafka facade's topic config
    # map + replication_factor, python/py-mofka-kafka.cpp:23-40).
    # Persisted verbatim; never interpreted by the engine.
    extra: dict[str, Any] = field(default_factory=dict)

    def backend_of(self, partition: int) -> str:
        if self.partition_backends is not None and partition < len(
            self.partition_backends
        ):
            return self.partition_backends[partition]
        return self.backend

    @property
    def backends_used(self) -> set[str]:
        return {self.backend_of(p) for p in range(self.num_partitions)}

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "TopicConfig":
        return TopicConfig(**json.loads(s))


def _atomic_write(path: str, content: str) -> None:
    """Write-then-rename so concurrent readers never see a torn file."""
    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-registry-")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(content)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


class TopicRegistry:
    """Directory-backed topic catalog.

    Layout::

        <root>/_registry/<topic>.json        # TopicConfig
        <root>/topics/<topic>/partition=<p>/ # Parquet event log (see log.py)
        <root>/topics/<topic>/_ledger.json   # next dense offset per partition
        <root>/topics/<topic>/_cursors/      # consumer ack cursors
    """

    def __init__(self, root: str):
        self.root = root
        self.registry_dir = os.path.join(root, "_registry")
        os.makedirs(self.registry_dir, exist_ok=True)

    # -- paths -------------------------------------------------------------
    @staticmethod
    def _safe_key(name: str) -> str:
        """Filesystem-safe key: topic names may be up to 256 chars
        (longer than most filesystems' 255-byte component limit), so long
        names get digest-suffixed. The true name lives in the config."""
        if len(name) <= 128:
            return name
        import hashlib

        return name[:96] + "-" + hashlib.sha256(name.encode()).hexdigest()[:24]

    def topic_path(self, name: str) -> str:
        return os.path.join(self.root, "topics", self._safe_key(name))

    def _config_path(self, name: str) -> str:
        return os.path.join(self.registry_dir, f"{self._safe_key(name)}.json")

    # -- DDL ---------------------------------------------------------------
    def create_topic(
        self,
        name: str,
        num_partitions: int = 1,
        validator: dict[str, Any] | None = None,
        selector: dict[str, Any] | None = None,
        serializer: dict[str, Any] | None = None,
        backend: str = "default",
        partition_backends: list[str] | None = None,
        extra: dict[str, Any] | None = None,
        write_cache: dict[str, Any] | None = None,
    ) -> TopicConfig:
        """S1 createTopic. Fails with TopicExistsError on duplicates.

        ``partition_backends``: optional per-partition backend list
        (length num_partitions) mixing "default"/"memory" on one topic,
        the reference's per-partition manager choice
        (/root/reference/src/MofkaDriver.cpp:510-643).
        ``extra``: opaque facade metadata persisted with the config
        (e.g. KafkaDriver's topic config + replication_factor).
        ``write_cache``: write-through batch cache config for file
        partitions ({"enabled", "max_batches", "max_memory_bytes"};
        None = reference defaults, enabled). Validated here like the
        reference's JSON-Schema partition-config check."""
        self._check_name(name)
        if num_partitions < 1:
            raise MofkaError(f"num_partitions must be >= 1, got {num_partitions}")
        if backend not in ("default", "memory"):
            raise MofkaError(f"unknown partition backend {backend!r}")
        if partition_backends is not None:
            if len(partition_backends) != num_partitions:
                raise MofkaError(
                    f"partition_backends has {len(partition_backends)} entries "
                    f"for {num_partitions} partitions"
                )
            bad = sorted(set(partition_backends) - {"default", "memory"})
            if bad:
                raise MofkaError(f"unknown partition backend(s) {bad!r}")
        write_cache = self._check_write_cache(write_cache)
        path = self._config_path(name)
        if os.path.exists(path):
            raise TopicExistsError(f"Topic {name!r} already exists")
        cfg = TopicConfig(
            name=name,
            num_partitions=num_partitions,
            validator=validator or dict(DEFAULT_VALIDATOR),
            selector=selector or dict(DEFAULT_SELECTOR),
            serializer=serializer or dict(DEFAULT_SERIALIZER),
            completed=False,
            created_at=time.time(),
            backend=backend,
            partition_backends=(
                list(partition_backends) if partition_backends is not None else None
            ),
            write_cache=write_cache,
            extra=dict(extra) if extra else {},
        )
        os.makedirs(self.topic_path(name), exist_ok=True)
        # O_EXCL-equivalent create-new-only semantics (NEW_ONLY putMulti,
        # src/MofkaDriver.cpp:211-267): atomically claim the file.
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise TopicExistsError(f"Topic {name!r} already exists") from None
        with os.fdopen(fd, "w") as f:
            f.write(cfg.to_json())
        return cfg

    @staticmethod
    def _check_write_cache(
        cfg: dict[str, Any] | None,
    ) -> dict[str, Any] | None:
        """Validate a write_cache config object at creation time (the
        reference validates the whole partition config against a JSON
        Schema; bad configs fail createTopic, not the first read)."""
        if cfg is None:
            return None
        if not isinstance(cfg, dict):
            raise MofkaError(
                f"write_cache must be an object, got {type(cfg).__name__}"
            )
        allowed = {"enabled", "max_batches", "max_memory_bytes"}
        unknown = sorted(set(cfg) - allowed)
        if unknown:
            raise MofkaError(f"unknown write_cache key(s) {unknown!r}")
        out = dict(cfg)
        if "enabled" in out and not isinstance(out["enabled"], bool):
            raise MofkaError("write_cache.enabled must be a boolean")
        for k in ("max_batches", "max_memory_bytes"):
            if k in out:
                v = out[k]
                if isinstance(v, bool) or not isinstance(v, int) or v < 1:
                    raise MofkaError(
                        f"write_cache.{k} must be a positive integer, got {v!r}"
                    )
        return out

    def open_topic(self, name: str) -> TopicConfig:
        """S2 openTopic. Fails with TopicNotFoundError if missing."""
        path = self._config_path(name)
        try:
            with open(path) as f:
                return TopicConfig.from_json(f.read())
        except FileNotFoundError:
            raise TopicNotFoundError(f"Topic {name!r} not found") from None

    def list_topics(self) -> list[str]:
        """S3 listTopics (prefix scan over registry keys)."""
        names = []
        for fn in os.listdir(self.registry_dir):
            if not fn.endswith(".json") or fn.startswith("."):
                continue
            key = fn[: -len(".json")]
            if len(key) <= 128:
                names.append(key)
            else:  # digest-keyed: read the true name from the config
                with open(os.path.join(self.registry_dir, fn)) as f:
                    names.append(json.load(f)["name"])
        return sorted(names)

    def topic_exists(self, name: str) -> bool:
        """S4 topicExists."""
        return os.path.exists(self._config_path(name))

    def add_partitions(
        self, name: str, count: int = 1, backend: str | None = None
    ) -> TopicConfig:
        """S5 addPartition — extend the partition count, optionally with
        a different storage backend for the new partitions (the
        reference's addMemoryPartition/addDefaultPartition per-partition
        manager choice, include/mofka/MofkaDriver.hpp:220-279; "legacy"
        collapses into "default" — both are file-backed logs here).
        """
        if backend is not None and backend not in ("default", "memory"):
            raise MofkaError(f"unknown partition backend {backend!r}")
        cfg = self.open_topic(name)
        if backend is not None and backend != cfg.backend:
            # materialize the per-partition list on first divergence
            if cfg.partition_backends is None:
                cfg.partition_backends = [cfg.backend] * cfg.num_partitions
            cfg.partition_backends += [backend] * count
        elif cfg.partition_backends is not None:
            cfg.partition_backends += [backend or cfg.backend] * count
        cfg.num_partitions += count
        _atomic_write(self._config_path(name), cfg.to_json())
        return cfg

    def mark_as_complete(self, name: str) -> TopicConfig:
        """L8 markAsComplete — consumers drain then see NoMoreEvents."""
        cfg = self.open_topic(name)
        cfg.completed = True
        _atomic_write(self._config_path(name), cfg.to_json())
        return cfg

    def destroy_topic(self, name: str) -> None:
        """S9 destroy — drop registry entry and data."""
        import shutil

        if not self.topic_exists(name):
            raise TopicNotFoundError(f"Topic {name!r} not found")
        os.unlink(self._config_path(name))
        shutil.rmtree(self.topic_path(name), ignore_errors=True)

    # -- helpers -----------------------------------------------------------
    @staticmethod
    def _check_name(name: str) -> None:
        if not name or len(name) > MAX_TOPIC_NAME_LEN:
            raise MofkaError(
                f"Invalid topic name (1..{MAX_TOPIC_NAME_LEN} chars): {name!r}"
            )
        if "/" in name or name.startswith("."):
            raise MofkaError(f"Invalid topic name: {name!r}")
