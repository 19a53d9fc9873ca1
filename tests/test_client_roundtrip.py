"""End-to-end produce/consume parity — the reference's 100-event
integration invariants (FIXTURES.md F1;
/root/reference/tests/MofkaEventConsumerTest.cpp:45-135):

- per-partition offsets dense 0..count-1
- metadata round-trips
- data bytes round-trip
- ack cursor = offset+1; re-subscribed consumer resumes from cursor
- after mark_as_complete, pulls return NoMoreEvents forever
"""

import pytest

from mofka_spark.client import NoMoreEvents
from mofka_spark.errors import MofkaError, ValidationError


def _produce_100(driver, topic_name="mytopic", partitions=1):
    topic = driver.create_topic(topic_name, num_partitions=partitions)
    with topic.producer("p", batch_size=25) as producer:
        futures = []
        for i in range(100):
            futures.append(
                producer.push(
                    {"event_num": i},
                    f"This is data for event {i}".encode(),
                )
            )
    return topic, futures


def test_roundtrip_single_partition(driver):
    topic, futures = _produce_100(driver)
    # dense ids assigned in push order (EventID semantics)
    ids = [f.wait() for f in futures]
    assert ids == list(range(100))

    consumer = topic.consumer("c", batch_size=32)
    topic.mark_as_complete()
    events = list(consumer)
    assert len(events) == 100
    for i, ev in enumerate(events):
        assert ev.offset == i
        assert ev.metadata == {"event_num": i}
        assert ev.data == f"This is data for event {i}".encode()
    # drained + complete -> NoMoreEvents forever
    assert consumer.pull() is NoMoreEvents
    assert consumer.pull() is NoMoreEvents


def test_roundtrip_four_partitions(driver):
    topic, futures = _produce_100(driver, partitions=4)
    ids = [f.wait() for f in futures]
    # round-robin: event i -> partition i%4, offset i//4
    assert ids == [i // 4 for i in range(100)]

    df = topic.dataframe()
    stats = {r["partition"]: r for r in topic.log.partition_stats().collect()}
    assert set(stats) == {0, 1, 2, 3}
    for p in range(4):
        assert stats[p]["n_events"] == 25
        assert stats[p]["min_offset"] == 0
        assert stats[p]["max_offset"] == 24
        assert stats[p]["dense"]
    assert df.count() == 100


def test_explicit_partition_honored_mod_n(driver):
    topic = driver.create_topic("t", num_partitions=4)
    with topic.producer("p") as producer:
        f = producer.push({"event_num": 0}, b"x", partition=6)
    ev_partition = topic.dataframe().select("partition").first()["partition"]
    assert ev_partition == 6 % 4
    assert f.wait() == 0


def test_ack_cursor_resume(driver):
    """Ack every 5th event; a re-subscribed consumer resumes at cursor
    (reference: tests/MofkaEventConsumerTest.cpp:68-76,
    src/DefaultPartitionManager.cpp:423-427)."""
    topic, _ = _produce_100(driver)
    topic.mark_as_complete()
    c1 = topic.consumer("worker", batch_size=10)
    for ev in c1:
        if ev.offset % 5 == 0:
            ev.acknowledge()
    # cursor = 95 + 1 = 96
    assert topic.log.load_cursors("worker") == {0: 96}
    c2 = topic.consumer("worker", batch_size=10)
    resumed = list(c2)
    assert [e.offset for e in resumed] == [96, 97, 98, 99]


def test_consumer_partition_targets(driver):
    topic, _ = _produce_100(driver, partitions=4)
    topic.mark_as_complete()
    c = topic.consumer("c", targets=[1, 3])
    parts = {e.partition for e in c}
    assert parts == {1, 3}
    with pytest.raises(MofkaError):
        topic.consumer("c2", targets=[4])


def test_multiple_producer_batches_stay_dense(driver):
    topic = driver.create_topic("t", num_partitions=2)
    p1 = topic.producer("p1")
    for i in range(10):
        p1.push({"event_num": i}, b"a")
    p1.flush()
    p2 = topic.producer("p2")
    futs = [p2.push({"event_num": 100 + i}, b"b") for i in range(10)]
    p2.flush()
    # second producer's ids continue from the ledger
    assert sorted(f.wait() for f in futs) == [5, 5, 6, 6, 7, 7, 8, 8, 9, 9]
    stats = topic.log.partition_stats().collect()
    for r in stats:
        assert r["dense"], r


def test_schema_validator_rejects_at_push(driver):
    # FIXTURES.md F5
    topic = driver.create_topic(
        "t",
        validator={
            "type": "schema",
            "schema": {
                "type": "object",
                "properties": {"event_num": {"type": "integer"}},
                "required": ["event_num"],
            },
        },
    )
    producer = topic.producer("p")
    producer.push({"event_num": 1}, b"ok")
    with pytest.raises(ValidationError):
        producer.push({"other": 1}, b"bad")
    with pytest.raises(ValidationError):
        producer.push({"event_num": "nope"}, b"bad")
    producer.flush()
    assert topic.dataframe().count() == 1


def test_eventbridge_validator_rejects_at_push(driver):
    topic = driver.create_topic(
        "t",
        validator={"type": "eventbridge", "pattern": {"kind": ["good"]}},
    )
    producer = topic.producer("p")
    producer.push({"kind": "good"}, b"")
    with pytest.raises(ValidationError):
        producer.push({"kind": "bad"}, b"")
    producer.flush()
    assert topic.dataframe().count() == 1


def test_bulk_push_dataframe(driver, spark):
    """The 100 TB ingest path: declarative validate+partition+append."""
    import pyspark.sql.functions as F

    topic = driver.create_topic("bulk", num_partitions=4)
    producer = topic.producer("p")
    src = spark.range(1000).select(
        F.to_json(F.struct(F.col("id").alias("event_num"))).alias("metadata"),
        F.encode(F.concat(F.lit("payload-"), F.col("id")), "utf-8").alias("data"),
    )
    acks = producer.push_dataframe(src)
    assert sum(n for _, n in acks.values()) == 1000
    stats = topic.log.partition_stats().collect()
    assert sum(r["n_events"] for r in stats) == 1000
    for r in stats:
        assert r["dense"], r
    # appending again continues offsets densely
    producer.push_dataframe(src)
    stats2 = {r["partition"]: r for r in topic.log.partition_stats().collect()}
    for p, r in stats2.items():
        assert r["dense"], r
        assert r["min_offset"] == 0


def test_ledger_recovery(driver):
    topic, _ = _produce_100(driver, partitions=2)
    import os

    os.unlink(topic.log.ledger_path)
    recovered = topic.log.recover_ledger()
    assert recovered == {0: 50, 1: 50}


class TestOrderingAndAckEarly:
    """P9/P10 parity: both orderings and ack_early are accepted and
    yield identical observable behavior — per-partition FIFO, dense ids
    (the reference routes both through one sender per partition queue
    and drops ack_early server-side; SURVEY.md P9/P10)."""

    def _produce_consume(self, driver, name, **producer_kwargs):
        topic = driver.create_topic(name, num_partitions=2)
        with topic.producer("p", **producer_kwargs) as prod:
            futs = [prod.push({"n": i}, partition=i % 2) for i in range(20)]
        ids = [f.wait() for f in futs]
        topic.mark_as_complete()
        evs = list(topic.consumer("c"))
        per = {}
        for ev in evs:
            per.setdefault(ev.partition, []).append((ev.offset, ev.metadata["n"]))
        return ids, per

    def test_strict_and_loose_same_observable_order(self, driver):
        ids_s, per_s = self._produce_consume(driver, "ord-strict", ordering="strict")
        ids_l, per_l = self._produce_consume(driver, "ord-loose", ordering="loose")
        assert ids_s == ids_l
        assert per_s == per_l
        # per-partition FIFO: offsets dense and push order preserved
        for part, rows in per_s.items():
            offsets = [o for o, _ in rows]
            ns = [n for _, n in rows]
            assert offsets == list(range(len(rows)))
            assert ns == sorted(ns)

    def test_ack_early_same_results(self, driver):
        ids_a, per_a = self._produce_consume(driver, "ack-early", ack_early=True)
        ids_b, per_b = self._produce_consume(driver, "ack-late", ack_early=False)
        assert ids_a == ids_b
        assert per_a == per_b


class TestPackedSerializer:
    def test_round_trip(self):
        from mofka_spark.functions.serializers import PackedSerializer

        s = PackedSerializer(
            [
                {"name": "n", "type": "long"},
                {"name": "x", "type": "double"},
                {"name": "flag", "type": "bool"},
                {"name": "tag", "type": "string"},
            ]
        )
        doc = {"n": -42, "x": 3.5, "flag": True, "tag": "héllo", "dropped": 1}
        out = s.deserialize(s.serialize(doc))
        assert out == {"n": -42, "x": 3.5, "flag": True, "tag": "héllo"}

    def test_missing_fields(self):
        from mofka_spark.functions.serializers import PackedSerializer

        s = PackedSerializer([{"name": "a", "type": "long"}, {"name": "b", "type": "string"}])
        assert s.deserialize(s.serialize({"b": "x"})) == {"b": "x"}
        assert s.deserialize(s.serialize({})) == {}

    def test_bad_type_rejected(self):
        import pytest as _pytest

        from mofka_spark.errors import MofkaError
        from mofka_spark.functions.serializers import PackedSerializer

        with _pytest.raises(MofkaError):
            PackedSerializer([{"name": "a", "type": "blob"}])

    def test_topic_config_round_trip(self, driver):
        topic = driver.create_topic(
            "packed-t",
            serializer={
                "type": "packed",
                "fields": [{"name": "n", "type": "long"}, {"name": "s", "type": "string"}],
            },
        )
        with topic.producer("p") as prod:
            prod.push({"n": 7, "s": "seven"})
        topic.mark_as_complete()
        # the log stores the packed form; the consumer surfaces raw
        # metadata strings which the topic serializer decodes
        from mofka_spark.functions.serializers import Serializer

        ser = Serializer.from_metadata(topic._cfg.serializer)
        row = topic.dataframe().collect()[0]
        assert ser.deserialize(row["metadata"]) == {"n": 7, "s": "seven"}

    def test_consumer_decodes_packed(self, driver):
        topic = driver.create_topic(
            "packed-c",
            serializer={
                "type": "packed",
                "fields": [{"name": "n", "type": "long"}],
            },
        )
        with topic.producer("p") as prod:
            for i in range(5):
                prod.push({"n": i})
        topic.mark_as_complete()
        evs = list(topic.consumer("c"))
        assert [ev.metadata for ev in evs] == [{"n": i} for i in range(5)]


class TestAvroSerializer:
    SCHEMA = {
        "type": "record",
        "name": "Event",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
            {"name": "flag", "type": "boolean"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
            {"name": "opt", "type": ["null", "string"]},
            {"name": "kind", "type": {"type": "enum", "name": "K",
                                      "symbols": ["alpha", "beta"]}},
        ],
    }

    def test_round_trip(self):
        from mofka_spark.functions.serializers import AvroSerializer

        s = AvroSerializer(self.SCHEMA)
        doc = {
            "id": -123456789,
            "name": "héllo",
            "score": 2.75,
            "flag": True,
            "tags": ["a", "b", "c"],
            "props": {"x": 1, "y": -2},
            "opt": None,
            "kind": "beta",
        }
        assert s.deserialize(s.serialize(doc)) == doc

    def test_golden_bytes(self):
        # spec vectors: zigzag(1)=2, zigzag(-1)=1, zigzag(-64)=127,
        # zigzag(64)=0x80 0x01; string length prefix + utf8
        import base64

        from mofka_spark.functions.serializers import AvroSerializer

        s = AvroSerializer(
            {"type": "record", "name": "R",
             "fields": [{"name": "a", "type": "long"},
                        {"name": "b", "type": "string"}]}
        )
        raw = base64.b64decode(s.serialize({"a": -64, "b": "foo"}))
        assert raw == bytes([0x7F, 0x06]) + b"foo"
        raw = base64.b64decode(s.serialize({"a": 64, "b": ""}))
        assert raw == bytes([0x80, 0x01, 0x00])

    def test_union_branch_and_errors(self):
        import pytest as _pytest

        from mofka_spark.errors import MofkaError
        from mofka_spark.functions.serializers import AvroSerializer

        s = AvroSerializer(
            {"type": "record", "name": "R",
             "fields": [{"name": "v", "type": ["null", "long", "string"]}]}
        )
        for doc in ({"v": None}, {"v": 7}, {"v": "s"}):
            assert s.deserialize(s.serialize(doc)) == doc
        with _pytest.raises(MofkaError):
            s.serialize({"v": [1, 2]})  # no array branch
        with _pytest.raises(MofkaError):
            AvroSerializer({"type": "record", "name": "E", "fields": []})

    def test_topic_round_trip(self, driver):
        topic = driver.create_topic(
            "avro-t", serializer={"type": "avro", "schema": self.SCHEMA}
        )
        docs = [
            {"id": i, "name": f"n{i}", "score": i / 2, "flag": i % 2 == 0,
             "tags": [f"t{i}"], "props": {"p": i}, "opt": None if i % 2 else "o",
             "kind": "alpha"}
            for i in range(6)
        ]
        with topic.producer("p") as prod:
            for d in docs:
                prod.push(d)
        topic.mark_as_complete()
        assert [ev.metadata for ev in topic.consumer("c")] == docs


class TestPrefetchConsumer:
    def test_prefetch_same_results(self, driver):
        topic = driver.create_topic("pref-t", num_partitions=2)
        with topic.producer("p") as prod:
            for i in range(40):
                prod.push({"n": i})
        topic.mark_as_complete()
        plain = [(e.partition, e.offset, e.metadata["n"]) for e in topic.consumer("a", batch_size=8)]
        pre = [(e.partition, e.offset, e.metadata["n"]) for e in topic.consumer("b", batch_size=8, prefetch=True)]
        assert plain == pre
        assert len(pre) == 40

    def test_prefetch_pipeline_active(self, driver):
        from mofka_spark.client import NoMoreEvents

        topic = driver.create_topic("pref-t2", num_partitions=1)
        with topic.producer("p") as prod:
            for i in range(20):
                prod.push({"n": i})
        c = topic.consumer("c", batch_size=5, prefetch=True)
        first = c.pull()
        assert first.offset == 0
        # after the first batch is delivered, the next fetch is in flight
        assert c._pending is not None
        topic.mark_as_complete()
        rest = list(c)
        assert len(rest) == 19
        assert c.pull() is NoMoreEvents


class TestSqlSurface:
    """Driver.sql: topics as SQL tables (beyond-reference surface)."""

    def test_sql_over_topics(self, driver):
        topic = driver.create_topic("sqltop", num_partitions=2)
        with topic.producer("p") as prod:
            for i in range(10):
                prod.push({"n": i}, data=b"")
        views = driver.register_views()
        assert "topic_sqltop" in views
        row = driver.sql(
            "SELECT COUNT(*) AS n, SUM(get_json_object(metadata, '$.n')) AS s"
            " FROM topic_sqltop"
        ).collect()[0]
        assert (row.n, row.s) == (10, 45.0)

    def test_sql_join_across_topics(self, driver):
        a = driver.create_topic("sqla")
        b = driver.create_topic("sql-b")
        with a.producer("p") as pa:
            for i in range(4):
                pa.push({"k": i}, data=b"")
        with b.producer("p") as pb:
            for i in range(2, 6):
                pb.push({"k": i}, data=b"")
        out = driver.sql(
            "SELECT COUNT(*) AS n FROM topic_sqla x JOIN topic_sql_b y"
            " ON get_json_object(x.metadata, '$.k') ="
            "    get_json_object(y.metadata, '$.k')"
        ).collect()[0]
        assert out.n == 2

    def test_parsed_dataframe_and_views(self, driver):
        schema = {
            "type": "object",
            "properties": {
                "n": {"type": "integer"},
                "tag": {"type": "string"},
                "xs": {"type": "array", "items": {"type": "number"}},
            },
            "required": ["n"],
        }
        topic = driver.create_topic(
            "typed", validator={"type": "schema", "schema": schema}
        )
        with topic.producer("p") as prod:
            for i in range(5):
                prod.push({"n": i, "tag": f"t{i}", "xs": [i * 1.5]}, data=b"")
        df = topic.dataframe(parsed=True)
        rows = df.select("meta.n", "meta.tag", "meta.xs").orderBy("meta.n").collect()
        assert [r.n for r in rows] == list(range(5))
        assert rows[2].xs == [3.0]
        # typed fields usable straight from SQL views
        out = driver.sql(
            "SELECT SUM(meta.n) AS s FROM topic_typed WHERE meta.tag <> 't0'"
        ).collect()[0]
        assert out.s == 10

    def test_parsed_requires_schema_topic(self, driver):
        import pytest as _pytest

        from mofka_spark.errors import MofkaError

        topic = driver.create_topic("untyped")
        with _pytest.raises(MofkaError):
            topic.dataframe(parsed=True)

    def test_snapshot_reads_are_stable(self, driver):
        topic = driver.create_topic("snap", num_partitions=2)
        with topic.producer("p") as prod:
            for i in range(10):
                prod.push({"i": i}, data=b"")
        cut = topic.snapshot()
        assert sum(cut.values()) == 10
        with topic.producer("p") as prod:
            for i in range(10, 30):
                prod.push({"i": i}, data=b"")
        # the cut still reads exactly the first 10 events
        first = topic.dataframe(until=cut)
        assert first.count() == 10
        import json as _json

        seen = sorted(
            _json.loads(r.metadata)["i"] for r in first.collect()
        )
        assert seen == list(range(10))
        assert topic.dataframe().count() == 30
        # empty cut reads nothing
        assert topic.dataframe(until={}).count() == 0


class TestDataAllocator:
    """C4 DataAllocator: consumer-provided destination buffers
    (/root/reference/src/MofkaConsumer.cpp:240-262 — the broker
    allocates, the engine lands bytes into it, a size mismatch
    throws)."""

    def test_bytes_land_in_caller_buffers(self, driver):
        topic, _ = _produce_100(driver, "alloc-t", partitions=2)
        topic.mark_as_complete()
        pool = []

        def alloc(meta, desc):
            buf = bytearray(desc.size)
            pool.append(buf)
            return buf

        consumer = topic.consumer("c", data_allocator=alloc)
        evs = list(consumer)
        assert len(evs) == 100
        for ev in evs:
            assert isinstance(ev.data, bytearray)
            assert ev.data is pool[pool.index(ev.data)]  # caller's object
            assert bytes(ev.data) == (
                f"This is data for event {ev.metadata['event_num']}".encode()
            )

    def test_numpy_buffer_filled_in_place(self, driver):
        import numpy as np

        topic, _ = _produce_100(driver, "alloc-np")
        topic.mark_as_complete()

        def alloc(meta, desc):
            return np.zeros(desc.size, dtype=np.uint8)

        consumer = topic.consumer("c", data_allocator=alloc)
        ev = consumer.pull()
        assert isinstance(ev.data, np.ndarray)
        assert ev.data.tobytes() == b"This is data for event 0"

    def test_composes_with_selector(self, driver):
        topic, _ = _produce_100(driver, "alloc-sel")
        topic.mark_as_complete()

        def select(meta, desc):
            return desc.make_sub_view(0, 4)  # first 4 bytes

        def alloc(meta, desc):
            assert desc.size == 4
            return bytearray(desc.size)

        consumer = topic.consumer("c", data_selector=select, data_allocator=alloc)
        ev = consumer.pull()
        assert bytes(ev.data) == b"This"

    def test_size_mismatch_raises(self, driver):
        topic, _ = _produce_100(driver, "alloc-bad")
        topic.mark_as_complete()
        consumer = topic.consumer("c", data_allocator=lambda m, d: bytearray(1))
        with pytest.raises(MofkaError, match="size"):
            consumer.pull()

    def test_readonly_buffer_raises(self, driver):
        topic, _ = _produce_100(driver, "alloc-ro")
        topic.mark_as_complete()
        consumer = topic.consumer(
            "c", data_allocator=lambda m, d: bytes(d.size)
        )
        with pytest.raises(MofkaError, match="WRITABLE"):
            consumer.pull()


class TestProducerBackPressure:
    """max_num_batches is the in-flight batch-queue bound: full batches
    go to a background sender; push blocks once the queue is full
    (/root/reference/src/ActiveProducerBatchQueue.hpp:51-86)."""

    def test_async_pipeline_roundtrip(self, driver):
        # pipelined sends preserve dense per-partition offsets and
        # metadata/data round-trip — the 100-event invariants hold
        topic = driver.create_topic("bp-roundtrip", num_partitions=4)
        with topic.producer("p", batch_size=10, max_num_batches=3) as p:
            futures = [
                p.push({"event_num": i}, f"d{i}".encode()) for i in range(100)
            ]
        ids = [f.wait() for f in futures]
        assert ids == [i // 4 for i in range(100)]
        topic.mark_as_complete()
        events = list(topic.consumer("c"))
        assert len(events) == 100
        got = {(e.metadata["event_num"]): e.data for e in events}
        assert got == {i: f"d{i}".encode() for i in range(100)}

    def test_push_blocks_at_cap(self, driver):
        import threading
        import time

        topic = driver.create_topic("bp-block", num_partitions=1)
        gate = threading.Event()
        real_append = topic.log.append_rows
        calls = []

        def slow_append(rows, txn=None):
            calls.append(len(rows))
            gate.wait(10)
            return real_append(rows, txn)

        topic.log.append_rows = slow_append
        p = topic.producer("p", batch_size=1, max_num_batches=2)
        p.push({"i": 0}, b"0")   # batch 1: sender blocks in append
        p.push({"i": 1}, b"1")   # batch 2: queued, in-flight = 2

        blocked_done = threading.Event()

        def third_push():
            p.push({"i": 2}, b"2")  # must BLOCK: queue full
            blocked_done.set()

        t = threading.Thread(target=third_push, daemon=True)
        t.start()
        time.sleep(0.3)
        assert not blocked_done.is_set(), "push did not back-pressure"
        gate.set()  # writes drain
        assert blocked_done.wait(10), "push never unblocked"
        p.flush()
        t.join(10)
        assert calls == [1, 1, 1]
        # all three events durable, dense offsets
        topic.mark_as_complete()
        assert [e.offset for e in topic.consumer("c")] == [0, 1, 2]

    def test_failed_async_write_raises_on_flush(self, driver):
        topic = driver.create_topic("bp-err", num_partitions=1)

        def boom(rows, txn=None):
            raise RuntimeError("disk on fire")

        topic.log.append_rows = boom
        p = topic.producer("p", batch_size=1, max_num_batches=2)
        p.push({"i": 0}, b"0")
        with pytest.raises(RuntimeError, match="disk on fire"):
            p.flush()

    def test_sync_flush_path_starts_no_sender(self, driver):
        # adaptive producers (batch_size=None) never auto-flush, so the
        # barrier flush writes synchronously without a sender thread
        topic = driver.create_topic("bp-sync", num_partitions=1)
        with topic.producer("p") as p:
            p.push({"i": 0}, b"0")
            p.flush()
            assert p._sender is None
