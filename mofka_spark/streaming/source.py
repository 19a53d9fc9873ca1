"""Structured Streaming custom source for mofka topics.

The Spark re-expression of the consumer feed loop (SURVEY.md L3/C1):

- offsets       = {partition: next_offset} — exactly the reference's
  per-consumer cursor map (/root/reference/src/DefaultPartitionManager.cpp:415-504)
- latestOffset  = the ledger (total_events per partition); the
  ``batch_size`` option caps events/partition/trigger, mirroring the
  consumer batch_size forwarded to feedConsumer
  (/root/reference/src/ProviderImpl.hpp:162-201)
- partitions()  = one InputPartition per topic partition and offset
  range — partition-parallel reads, the Spark analog of per-partition
  feed ULTs
- read()        = executor-side pyarrow range scan over the partition's
  Parquet files (offset predicate pushed to the arrow dataset scan)
- Trigger.AvailableNow + a completed topic = drain-then-NoMoreEvents
  semantics (L8): the stream ends when the ledger stops moving.

Usage::

    spark.dataSource.register(MofkaDataSource)
    df = (spark.readStream.format("mofka")
          .option("path", root).option("topic", "mytopic")
          .option("batch_size", 1000)   # events/partition/trigger
          .load())
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from mofka_spark.log import EVENT_SCHEMA


@dataclass
class _RangePartition(InputPartition):
    partition: int
    start: int
    end: int
    data_dir: str
    topic: str


def _trace(self, msg: str) -> None:
    """Dev-only call tracing for the source-runner process (set
    MOFKA_SOURCE_TRACE to a file path); no-op otherwise."""
    path = os.environ.get("MOFKA_SOURCE_TRACE")
    if path:
        with open(path, "a") as f:
            f.write(
                f"pid={os.getpid()} id={id(self) % 100000} {msg} "
                f"floor={getattr(self, '_floor', None)} "
                f"last={getattr(self, '_last', None)}\n"
            )


def _read_ledger(topic_path: str) -> dict[str, int]:
    try:
        with open(os.path.join(topic_path, "_ledger.json")) as f:
            doc = json.load(f)
    except FileNotFoundError:
        return {}
    # ledger format v2 nests offsets under "offsets" (see log.py);
    # v1 files are the flat offsets map itself
    if "offsets" in doc or "txns" in doc:
        return doc.get("offsets", {})
    return doc


def _read_trim(topic_path: str) -> dict[str, int]:
    """Per-partition trim floors (retention; log.py ledger v5). Batch
    starts clamp to the floor so a stream attached to a trimmed topic —
    or resuming past a trim that happened while it was down — never
    emits retired offsets (whole files under the floor are deleted;
    straddling files still hold below-floor rows the scan would
    otherwise return)."""
    try:
        with open(os.path.join(topic_path, "_ledger.json")) as f:
            doc = json.load(f)
    except FileNotFoundError:
        return {}
    trim = doc.get("trim", {}) if isinstance(doc, dict) else {}
    return {str(k): int(v) for k, v in trim.items()}


def _arrow_scan(part: _RangePartition):
    """Executor-side: scan one partition dir for [start, end) offsets.

    pyarrow dataset pushes the offset predicate into the parquet scan
    (row-group pruning via min/max stats), so a small trigger batch
    reads only the tail files of the log."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    pdir = os.path.join(part.data_dir, f"partition={part.partition}")
    if not os.path.isdir(pdir):
        return
    dataset = pads.dataset(pdir, format="parquet")
    flt = (pads.field("offset") >= part.start) & (pads.field("offset") < part.end)
    scanner = dataset.scanner(
        columns=["topic", "offset", "metadata", "data", "ingest_ts"], filter=flt
    )
    for batch in scanner.to_batches():
        if batch.num_rows == 0:
            continue
        arrays = [
            pa.array([part.topic] * batch.num_rows, pa.string()),
            pa.array([part.partition] * batch.num_rows, pa.int32()),
            batch.column("offset").cast(pa.int64()),
            batch.column("metadata").cast(pa.string()),
            batch.column("data").cast(pa.binary()),
            batch.column("ingest_ts").cast(pa.timestamp("us")),
        ]
        yield pa.RecordBatch.from_arrays(
            arrays,
            names=["topic", "partition", "offset", "metadata", "data", "ingest_ts"],
        )


class MofkaStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, durable_floor: bool = True):
        self.root = options.get("path") or options.get("root")
        self.topic = options["topic"]
        if self.root is None:
            raise ValueError("mofka source requires option 'path' (engine root)")
        self.batch_size = int(options.get("batch_size", 0)) or None
        # starting_offsets: "earliest" (default — replay the log),
        # "latest" (attach at the current head: a monitor on a 100 TB
        # topic must not re-scan history), or a JSON {partition: offset}
        # map for explicit resume points. Kafka-source semantics; only
        # consulted on the FIRST run (checkpoints own it afterwards).
        self.starting = options.get("starting_offsets", "earliest")
        from mofka_spark.registry import TopicRegistry

        self.topic_path = TopicRegistry(self.root).topic_path(self.topic)
        self.data_dir = os.path.join(self.topic_path, "data")
        # rate-control state: the last end offset this reader announced.
        # The cap MUST happen in latestOffset (not partitions): Spark
        # commits whatever range latestOffset announces, so narrowing it
        # later would silently drop the tail of a batch.
        self._last: dict[str, int] | None = None
        # checkpoint floor: the highest batch START (from partitions())
        # or committed END (from commit()) seen per partition. After a
        # restart _last is gone; without the floor a capped
        # latestOffset would announce ends BELOW the checkpointed
        # position and the following batches would RE-DELIVER committed
        # offsets (observed as duplicate rows in a file sink). Both the
        # announcement base and every emitted range clamp to the floor.
        #
        # Durability: committed ends persist to "floor_path" and a
        # restarted reader reloads them — the floor then does not
        # depend on inferring the committed position from Spark's
        # recovery call pattern (the s == e probe heuristic in
        # partitions(), kept as a fallback). Resolution order:
        #   - explicit "floor_path" option (the read_stream(
        #     checkpoint=...) wiring puts it INSIDE the query's
        #     checkpoint dir, so isolation matches Spark's offset log);
        #   - "" disables the file (heuristic only — tests/tools);
        #   - otherwise, rate-capped stream readers DEFAULT to a file
        #     under <topic>/_stream_floor/ keyed by the query's option
        #     signature (topic, batch_size, starting_offsets), so the
        #     exactly-once restart guard is durable out of the box and
        #     dies with the topic. A LATER fresh query with the same
        #     options is safe — initialOffset (which Spark only calls
        #     when the offset log is empty, i.e. never on restart)
        #     resets the shared file to the fresh start. Queries that
        #     ALIAS the file (concurrent twins, or a restart racing a
        #     fresh query with identical options) cannot lose rows:
        #     file-loaded floors are advisory until this query's own
        #     restored position confirms ownership (see the tier
        #     comment below) — a foreign floor is discarded, at worst
        #     costing one oversized batch. Use read_stream(
        #     checkpoint=...) to isolate twins for tight rate caps.
        # Uncapped readers (batch_size None) take no default: without
        # the rate cap latestOffset never announces below committed
        # ends, so the floor guards nothing and a stale shared file
        # would only add risk. Batch-mode reads (MofkaBatchReader)
        # never default either — they must see the whole log.
        raw_floor = options.get("floor_path")
        if raw_floor == "":
            self.floor_path = None
        elif raw_floor is not None:
            self.floor_path = raw_floor
        elif durable_floor and self.batch_size is not None:
            import hashlib

            key = json.dumps(
                {
                    "topic": self.topic,
                    "batch_size": self.batch_size,
                    "starting": self.starting,
                },
                sort_keys=True,
            )
            self.floor_path = os.path.join(
                self.topic_path,
                "_stream_floor",
                f"q-{hashlib.sha1(key.encode()).hexdigest()[:12]}.json",
            )
        else:
            self.floor_path = None
        # Two floor tiers. _floor: SELF-EVIDENCED (this instance's own
        # partitions()/commit() calls, or initialOffset) — clamps both
        # the announcement and the emitted ranges. _file_floor (+
        # _file_from, the committed batch's start — the floor's
        # "signature"): loaded from the floor file at construction (a
        # restart, possibly of a DIFFERENT query aliasing the shared
        # default file) — used for the latestOffset announcement base
        # only (a too-high announcement merely enlarges a batch; a
        # too-high RANGE clamp silently skips rows) until ownership is
        # decided by _file_floor_evidence on a REAL planned batch.
        self._floor: dict[str, int] = {}
        self._file_floor: dict[str, int] = {}
        self._file_from: dict[str, int] = {}
        # last REAL planned range per partition — lets commit() record
        # which batch produced each floor (the signature)
        self._from: dict[str, int] = {}
        self._ranges: dict[str, tuple[int, int]] = {}
        if self.floor_path:
            try:
                with open(self.floor_path) as f:
                    doc = json.load(f)
                if isinstance(doc, dict) and "floors" in doc:
                    self._file_floor = {
                        str(k): int(v) for k, v in doc["floors"].items()
                    }
                    self._file_from = {
                        str(k): int(v)
                        for k, v in doc.get("from", {}).items()
                    }
                elif isinstance(doc, dict):  # legacy plain {p: floor}
                    self._file_floor = {
                        str(k): int(v) for k, v in doc.items()
                    }
            except (FileNotFoundError, ValueError):
                pass

    def _file_floor_evidence(self, p: str, s: int, e: int) -> None:
        """Promote or discard a pending file floor for partition ``p``
        using a REAL planned batch (s, e) — offsets Spark read from its
        own log, never values our file-floor-seeded announcements
        produced. Three cases:

        - (s, e) == (file_from, file_floor): this is the owner's
          crash-window replay of the exact batch that wrote the floor
          (sink committed, Spark's commit-log write lost) — promote,
          so the clamp suppresses the duplicate re-delivery.
        - s >= floor: the query's committed position is at/past the
          floor — owner (or a floor that can no longer skip anything);
          promote.
        - s < floor otherwise: the query is provably BEHIND a floor it
          did not write — foreign/stale; DISCARD rather than skip rows
          (the aliasing hazard of the shared default file). The one
          undecidable corner — a foreign query whose pending batch is
          byte-identical to the owner's committed range — clamps like
          the owner; isolate twins with read_stream(checkpoint=...).
        """
        ff = self._file_floor.get(p)
        if ff is None:
            return
        signature = self._file_from.get(p) == s and e == ff
        if signature or s >= ff:
            if ff > self._floor.get(p, 0):
                self._floor[p] = ff
        del self._file_floor[p]
        self._file_from.pop(p, None)

    def initialOffset(self) -> dict:
        _trace(self, "initialOffset")
        ledger = _read_ledger(self.topic_path)
        if self.starting == "latest":
            start = {p: int(n) for p, n in ledger.items()}
        elif self.starting != "earliest":
            explicit = {str(k): int(v) for k, v in json.loads(self.starting).items()}
            # clamp to the log: an offset past the head would make the
            # first batch's range negative
            start = {
                p: min(explicit.get(p, 0), int(ledger.get(p, 0)))
                for p in set(ledger) | set(explicit)
            }
        else:
            # start of the log: offset 0 for every known partition
            start = {p: 0 for p in ledger}
        # never start below a trim floor: those offsets are retired
        trims = _read_trim(self.topic_path)
        start = {p: max(s, trims.get(p, 0)) for p, s in start.items()}
        # Spark calls initialOffset ONLY when the query's offset log is
        # empty — i.e. this is a FRESH query, not a restart. Reset the
        # floor to the fresh start: a floor file left behind by an
        # EARLIER query on this topic (the shared default path) records
        # that query's committed ends and would otherwise clamp this
        # one's first batches empty / skip its early offsets.
        self._floor = dict(start)
        self._file_floor = {}  # fresh query: nothing pending to adopt
        self._file_from = {}
        self._from = {}
        self._save_floor()
        return start

    def latestOffset(self) -> dict:
        ledger = {p: int(n) for p, n in _read_ledger(self.topic_path).items()}
        if self.batch_size is None:
            return ledger
        # advance at most batch_size per partition per trigger
        # (consumer batch_size ≙ feedConsumer cap), never below the
        # checkpoint floor (see _floor).
        prev = self._last or {}
        out = {
            p: min(
                n,
                max(
                    prev.get(p, 0),
                    self._floor.get(p, 0),
                    # pending file floor: announcement base only — see
                    # the tier comment in __init__
                    self._file_floor.get(p, 0),
                )
                + self.batch_size,
            )
            for p, n in ledger.items()
        }
        self._last = out
        _trace(self, f"latestOffset -> {out}")
        return out

    def partitions(self, start: dict, end: dict):
        _trace(self, f"partitions start={start} end={end}")
        parts = []
        # current trim floors: a trim may land while the query runs (or
        # between a checkpointed stop and this restart); clamping each
        # batch start keeps retired offsets out of the scan (straddling
        # files still hold below-floor rows)
        trims = _read_trim(self.topic_path)
        for p, e in end.items():
            s = int(start.get(p, 0))
            e = int(e)
            p = str(p)
            # Decide pending file floors on REAL planned batches only
            # (the s == e recovery probe carries an END in both slots —
            # an end can exceed a foreign floor and must not decide).
            if s != e:
                self._file_floor_evidence(p, s, e)
                self._ranges[p] = (s, e)
            # Learn the checkpoint floor from a REAL batch's start: on
            # restart the first genuine plan's start is the committed
            # position. Skip degenerate s == e calls — Spark probes
            # partitions(latest, latest) on recovery BEFORE replaying
            # the pending batch, and taking that probe's start as floor
            # would clamp the replay empty (observed: lost rows).
            if s != e and s > self._floor.get(p, 0):
                self._floor[p] = s
            # Clamp to the floor: after a restart the rate-capped
            # latestOffset may have announced (and Spark logged) an end
            # BELOW the committed position; the follow-up batch would
            # re-deliver committed offsets (observed: duplicate rows).
            s = max(s, self._floor.get(p, 0), trims.get(p, 0))
            if e > s:
                parts.append(
                    _RangePartition(int(p), s, e, self.data_dir, self.topic)
                )
        if not parts:
            # Spark requires >= 1 partition; emit an empty range
            parts.append(_RangePartition(0, 0, 0, self.data_dir, self.topic))
        return parts

    def read(self, partition: _RangePartition):
        yield from _arrow_scan(partition)

    def commit(self, end: dict) -> None:
        _trace(self, f"commit end={end}")
        # checkpointing is Spark's job; remember committed ends so a
        # restarted reader's rate cap can never announce below them.
        # Record each floor's SIGNATURE (the committed batch's start,
        # from the preceding partitions() call) so a restart can
        # recognize its own crash-window replay — see
        # _file_floor_evidence. Pending file floors were already
        # resolved by that partitions() call; nothing to decide here.
        for p, n in end.items():
            p = str(p)
            n = int(n)
            rng = self._ranges.get(p)
            if rng is not None and rng[1] == n:
                self._from[p] = rng[0]
            self._floor[p] = max(self._floor.get(p, 0), n)
        self._save_floor()

    def _save_floor(self) -> None:
        if not self.floor_path:
            return
        os.makedirs(os.path.dirname(self.floor_path), exist_ok=True)
        tmp = f"{self.floor_path}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {"floors": self._floor, "from": self._from},
                f,
                sort_keys=True,
            )
        os.replace(tmp, self.floor_path)


class MofkaBatchReader(DataSourceReader):
    """Batch-mode read of a topic through the same source (for
    spark.read.format("mofka"); the native log.read() path is preferred
    for analytics because it uses Spark's vectorized parquet scan)."""

    def __init__(self, options: dict):
        # durable_floor=False: a batch read must scan the WHOLE log; a
        # floor file left by some streaming query must never clamp it
        self.stream = MofkaStreamReader(options, durable_floor=False)

    def partitions(self):
        end = self.stream.latestOffset()
        return self.stream.partitions({}, end)

    def read(self, partition: _RangePartition):
        yield from _arrow_scan(partition)


class MofkaDataSource(DataSource):
    """spark.dataSource.register(MofkaDataSource); format("mofka")."""

    @classmethod
    def name(cls) -> str:
        return "mofka"

    def schema(self) -> StructType:
        return EVENT_SCHEMA

    def reader(self, schema: StructType) -> MofkaBatchReader:
        return MofkaBatchReader(dict(self.options))

    def streamReader(self, schema: StructType) -> MofkaStreamReader:
        return MofkaStreamReader(dict(self.options))
