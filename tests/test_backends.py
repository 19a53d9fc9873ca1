"""Backend conformance: the same behavioral suite runs against both
partition storage backends (the reference runs its whole suite against
memory/default/legacy backends, tests/CMakeLists.txt:25-76)."""

import json

import pytest
from pyspark.sql import functions as F

from mofka_spark.client import NoMoreEvents
from mofka_spark.errors import MofkaError

BACKENDS = ["default", "memory", "mixed"]


def make_topic(driver, name, num_partitions, backend, **kw):
    """Create a topic for a conformance backend; "mixed" alternates
    file/memory per partition (the reference attaches a manager type
    per partition and runs its suite across all of them,
    src/MofkaDriver.cpp:510-643, tests/CMakeLists.txt:25-76)."""
    if backend == "mixed":
        n = max(2, num_partitions)
        return driver.create_topic(
            name,
            num_partitions=n,
            partition_backends=[
                "default" if p % 2 == 0 else "memory" for p in range(n)
            ],
            **kw,
        )
    return driver.create_topic(
        name, num_partitions=num_partitions, backend=backend, **kw
    )


@pytest.fixture(params=BACKENDS)
def backend(request):
    return request.param


class TestBackendConformance:
    def test_roundtrip_dense_and_complete(self, driver, backend):
        topic = make_topic(driver, f"bk-{backend}", 2, backend)
        with topic.producer("p") as prod:
            futs = [prod.push({"n": i}, data=bytes([i])) for i in range(20)]
        ids = [f.wait() for f in futs]
        assert sorted(ids) == sorted(list(range(10)) * 2)
        stats = topic.log.partition_stats().collect()
        assert all(r["dense"] for r in stats)
        assert sum(r["n_events"] for r in stats) == 20
        topic.mark_as_complete()
        consumer = topic.consumer("c")
        evs = list(consumer)
        assert len(evs) == 20
        assert consumer.pull() is NoMoreEvents
        # metadata + data round-trip
        for ev in evs:
            assert ev.data == bytes([ev.metadata["n"]])

    def test_cursor_ack_resume(self, driver, backend):
        topic = make_topic(driver, f"bk-ack-{backend}", 1, backend)
        with topic.producer("p") as prod:
            for i in range(10):
                # pin to partition 0 so the resume offset is exact even
                # for the "mixed" flavor (which has >= 2 partitions)
                prod.push({"n": i}, partition=0)
        c1 = topic.consumer("c")
        first = c1.pull()
        for _ in range(5):
            ev = first if _ == 0 else c1.pull()
            ev.acknowledge()
        # a new consumer instance with the same name resumes at cursor
        c2 = topic.consumer("c")
        nxt = c2.pull()
        assert nxt.offset == 5

    def test_bulk_dataframe_path(self, spark, driver, backend):
        topic = make_topic(driver, f"bk-bulk-{backend}", 4, backend)
        df = spark.createDataFrame(
            [(json.dumps({"i": i}),) for i in range(40)], ["metadata"]
        )
        acks = topic.producer("b").push_dataframe(df)
        assert sum(n for _, n in acks.values()) == 40
        assert topic.dataframe().count() == 40
        stats = topic.log.partition_stats().collect()
        assert all(r["dense"] for r in stats)

    def test_partition_subset_consumer(self, driver, backend):
        topic = make_topic(driver, f"bk-sub-{backend}", 3, backend)
        with topic.producer("p") as prod:
            for i in range(12):
                prod.push({"n": i}, partition=i % 3)
        topic.mark_as_complete()
        only1 = topic.consumer("c1", targets=[1])
        evs = list(only1)
        assert len(evs) == 4
        assert all(ev.partition == 1 for ev in evs)

    def test_destroy_clears_state(self, driver, backend):
        topic = make_topic(driver, f"bk-destroy-{backend}", 1, backend)
        with topic.producer("p") as prod:
            prod.push({"n": 1})
        driver.destroy_topic(topic.name)
        assert not driver.topic_exists(topic.name)
        # recreating starts empty at offset 0
        topic2 = make_topic(driver, topic.name, 1, backend)
        with topic2.producer("p") as prod:
            fut = prod.push({"n": 2})
        assert fut.wait() == 0


class TestMemoryBackendSpecifics:
    def test_append_batch_row_cap_fails_loudly(self, driver, spark):
        # the memory backend's append_batch collects to the driver; a
        # misconfigured mixed topic routing bulk ingest through it must
        # fail with a clear error, not OOM the driver
        from mofka_spark.errors import MofkaError
        import pytest as _pt
        from pyspark.sql import functions as F

        topic = driver.create_topic("mem-cap", num_partitions=1, backend="memory")
        topic.log.max_append_batch_rows = 10  # configurable per instance
        big = spark.range(11).select(
            F.lit(0).alias("partition"),
            F.col("id").alias("seq"),
            F.to_json(F.struct("id")).alias("metadata"),
            F.lit(None).cast("binary").alias("data"),
        )
        with _pt.raises(MofkaError, match="max_append_batch_rows"):
            topic.log.append_batch(big)
        # at the cap it still works
        topic.log.append_batch(big.limit(10))
        assert topic.dataframe().count() == 10

    def test_no_parquet_files_written(self, driver, tmp_path):
        topic = driver.create_topic("mem-nofiles", num_partitions=2, backend="memory")
        with topic.producer("p") as prod:
            for i in range(10):
                prod.push({"n": i})
        import os

        data_dir = topic.log.data_path
        found = []
        for root, _dirs, files in os.walk(data_dir) if os.path.isdir(data_dir) else []:
            found += [f for f in files if f.endswith(".parquet")]
        assert found == []
        assert topic.dataframe().count() == 10

    def test_stream_attach_spills_then_writes_through(self, driver):
        """read_stream() on a memory topic snapshots the store to the
        Parquet log and flips appends to write-through — the streaming
        source's executor-side scan can then serve it like any topic.
        Before the attach, the data plane does no file IO (see
        test_no_parquet_files_written)."""
        import os

        topic = driver.create_topic(
            "mem-stream", num_partitions=2, backend="memory"
        )
        with topic.producer("p") as prod:
            for i in range(6):
                prod.push({"n": i})
        data = topic.log.data_path
        assert not os.path.isdir(data) or not any(
            f.endswith(".parquet")
            for _r, _d, fs in os.walk(data)
            for f in fs
        )
        topic.read_stream()  # attach: spill + flag
        spilled = sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(data)
            for f in fs
            if f.endswith(".parquet")
        )
        assert spilled  # snapshot happened
        # appends after the attach write through
        with topic.producer("p2") as prod:
            for i in range(6, 10):
                prod.push({"n": i})
        df = topic.driver.spark.read.parquet(data)
        assert df.count() == 10
        # memory reads and spilled files agree exactly
        mem = {(r["partition"], r["offset"]) for r in topic.dataframe().collect()}
        fil = {(r["partition"], r["offset"]) for r in df.collect()}
        assert mem == fil

    def test_spill_resynced_after_restart(self, spark, tmp_path):
        """Process restart resets the memory store; stale spill files
        (which describe pre-restart rows) must be dropped and rewritten
        so the streaming view matches memory exactly."""
        import os

        from mofka_spark.client import Driver
        from mofka_spark.log import MemoryEventLog

        root = str(tmp_path / "mem-spill-root")
        d = Driver(spark, root)
        topic = d.create_topic("mem-rs", num_partitions=1, backend="memory")
        with topic.producer("p") as prod:
            for i in range(5):
                prod.push({"n": i})
        topic.read_stream()  # spill [0, 5)
        # simulate restart: store dies, spill files + flag survive
        MemoryEventLog._STORES.pop(topic.log.topic_path, None)
        fresh = Driver(spark, root).open_topic("mem-rs")
        with fresh.producer("p2") as prod:
            prod.push({"n": 100})
        # the topic restarted dense at 0; spill agrees with memory
        assert fresh.log.next_offsets() == {0: 1}
        files = [
            os.path.join(r, f)
            for r, _d, fs in os.walk(fresh.log.data_path)
            for f in fs
            if f.endswith(".parquet")
        ]
        assert files
        spilled = spark.read.parquet(fresh.log.data_path)
        assert [(r["partition"], r["offset"]) for r in spilled.collect()] == [(0, 0)]

    def test_unknown_backend_rejected(self, driver):
        with pytest.raises(MofkaError):
            driver.create_topic("bad-backend", backend="rocksdb")


class TestMixedBackendSpecifics:
    """S5 per-partition backend mix on ONE topic
    (/root/reference/src/MofkaDriver.cpp:510-643)."""

    def test_rows_route_to_their_backend(self, driver):
        import os

        topic = make_topic(driver, "mix-route", 2, "mixed")  # 0=file, 1=memory
        with topic.producer("p") as prod:
            for i in range(12):
                prod.push({"n": i}, partition=i % 2)
        # file partition wrote parquet; memory partition wrote none
        data = topic.log.data_path
        assert os.path.isdir(os.path.join(data, "partition=0"))
        assert not os.path.isdir(os.path.join(data, "partition=1"))
        # both serve reads through one DataFrame
        per = {
            r["partition"]: r["n_events"]
            for r in topic.log.partition_stats().collect()
        }
        assert per == {0: 6, 1: 6}

    def test_add_partitions_with_backend_diverges(self, driver):
        topic = driver.create_topic("mix-grow", num_partitions=2)
        driver.add_partitions("mix-grow", 1, backend="memory")
        cfg = driver.registry.open_topic("mix-grow")
        assert cfg.num_partitions == 3
        assert [cfg.backend_of(p) for p in range(3)] == [
            "default", "default", "memory",
        ]
        grown = driver.open_topic("mix-grow")
        with grown.producer("p") as prod:
            for i in range(9):
                prod.push({"n": i}, partition=i % 3)
        grown.mark_as_complete()
        assert len(list(grown.consumer("c"))) == 9

    def test_stream_attach_spills_only_memory_partitions(self, driver):
        """On a mixed topic the attach-time spill touches only the
        memory partitions; file partitions already live in the log."""
        import os

        topic = make_topic(driver, "mix-stream", 2, "mixed")  # 0=file, 1=memory
        with topic.producer("p") as prod:
            for i in range(8):
                prod.push({"n": i}, partition=i % 2)
        topic.read_stream()
        df = topic.driver.spark.read.parquet(topic.log.data_path)
        per = {r["partition"]: r["n"] for r in
               df.groupBy("partition").agg(F.count("*").alias("n")).collect()}
        assert per == {0: 4, 1: 4}
        assert os.path.exists(
            os.path.join(topic.log.topic_path, "_stream_spill")
        )

    def test_restart_keeps_file_resets_memory(self, spark, tmp_path):
        from mofka_spark.client import Driver
        from mofka_spark.log import MemoryEventLog

        root = str(tmp_path / "mix-root")
        d = Driver(spark, root)
        topic = d.create_topic(
            "mix-restart", num_partitions=2,
            partition_backends=["default", "memory"],
        )
        with topic.producer("p") as prod:
            for i in range(8):
                prod.push({"n": i}, partition=i % 2)
        # simulate process restart: the memory store dies, files survive
        MemoryEventLog._STORES.pop(topic.log.topic_path, None)
        fresh = Driver(spark, root).open_topic("mix-restart")
        with fresh.producer("p2") as prod:
            prod.push({"n": 100}, partition=1)  # memory partition restarts at 0
        rows = {(r["partition"], r["offset"]) for r in
                fresh.dataframe().select("partition", "offset").collect()}
        assert (0, 3) in rows          # file rows intact
        assert (1, 0) in rows          # memory partition restarted dense at 0
        assert len([r for r in rows if r[0] == 1]) == 1

    def test_bulk_append_routes_partition_added_after_handle(self, spark, driver):
        """Partitions added AFTER a mixed handle was built must not be
        silently dropped by append_batch (they route to the default file
        sub-log, like _sub_for), and must be readable through read() and
        fetch_rows() without reopening the handle."""
        import json as _json

        from mofka_spark.log import make_ingest_df

        driver.create_topic(
            "mix-late", num_partitions=2,
            partition_backends=["default", "memory"],
        )
        handle = driver.open_topic("mix-late")  # scopes frozen: {0}, {1}
        driver.add_partitions("mix-late", 1)    # partition 2, file-backed
        rows = [
            {"partition": p, "seq": i, "metadata": _json.dumps({"i": i}), "data": None}
            for i, p in enumerate([0, 1, 2, 2])
        ]
        acks = handle.log.append_batch(make_ingest_df(spark, rows))
        assert acks == {0: (0, 1), 1: (0, 1), 2: (0, 2)}
        # readable through the SAME handle, no reopen
        per = {
            r["partition"]: r["n_events"]
            for r in handle.log.partition_stats().collect()
        }
        assert per == {0: 1, 1: 1, 2: 2}
        fetched = handle.log.fetch_rows({}, 100)
        assert sorted((p, o) for p, o, _m, _d in fetched) == [
            (0, 0), (1, 0), (2, 0), (2, 1),
        ]
        # a DIFFERENT pre-existing handle sees them too (ledger-driven
        # scope refresh, not just adopt-on-append)
        other = driver.open_topic("mix-late")
        assert other.dataframe().count() == 4

    def test_fast_path_routes_partition_added_after_handle(self, driver):
        """Same guarantee for the per-event fast path (append_rows)."""
        import json as _json

        driver.create_topic(
            "mix-late2", num_partitions=2,
            partition_backends=["default", "memory"],
        )
        handle = driver.open_topic("mix-late2")
        driver.add_partitions("mix-late2", 1)
        acks = handle.log.append_rows(
            [(2, 0, _json.dumps({"i": 0}), None), (2, 1, _json.dumps({"i": 1}), None)]
        )
        assert acks == {2: (0, 2)}
        assert handle.dataframe().count() == 2
        assert [
            (p, o) for p, o, _m, _d in handle.log.fetch_rows({}, 10)
        ] == [(2, 0), (2, 1)]

    def test_bulk_epoch_spans_both_backends_once(self, spark, driver):
        import json as _json

        from mofka_spark.log import make_ingest_df

        topic = make_topic(driver, "mix-txn", 2, "mixed")
        rows = [
            {"partition": p, "seq": i, "metadata": _json.dumps({"i": i}), "data": None}
            for i, p in enumerate([0, 1, 0, 1])
        ]
        df = make_ingest_df(spark, rows)
        acks = topic.log.append_batch(df, txn=("s", 3))
        assert sum(n for _, n in acks.values()) == 4
        # replay of the same epoch is a no-op across BOTH backends
        assert topic.log.append_batch(df, txn=("s", 3)) == {}
        assert topic.dataframe().count() == 4
