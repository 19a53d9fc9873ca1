"""Backend conformance: the same behavioral suite runs against both
partition storage backends (the reference runs its whole suite against
memory/default/legacy backends, tests/CMakeLists.txt:25-76)."""

import json

import pytest
from pyspark.sql import functions as F

from mofka_spark.client import NoMoreEvents
from mofka_spark.errors import MofkaError

BACKENDS = ["default", "memory"]


@pytest.fixture(params=BACKENDS)
def backend(request):
    return request.param


class TestBackendConformance:
    def test_roundtrip_dense_and_complete(self, driver, backend):
        topic = driver.create_topic(f"bk-{backend}", num_partitions=2, backend=backend)
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
        topic = driver.create_topic(f"bk-ack-{backend}", num_partitions=1, backend=backend)
        with topic.producer("p") as prod:
            for i in range(10):
                prod.push({"n": i})
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
        topic = driver.create_topic(f"bk-bulk-{backend}", num_partitions=4, backend=backend)
        df = spark.createDataFrame(
            [(json.dumps({"i": i}),) for i in range(40)], ["metadata"]
        )
        acks = topic.producer("b").push_dataframe(df)
        assert sum(n for _, n in acks.values()) == 40
        assert topic.dataframe().count() == 40
        stats = topic.log.partition_stats().collect()
        assert all(r["dense"] for r in stats)

    def test_partition_subset_consumer(self, driver, backend):
        topic = driver.create_topic(f"bk-sub-{backend}", num_partitions=3, backend=backend)
        with topic.producer("p") as prod:
            for i in range(12):
                prod.push({"n": i}, partition=i % 3)
        topic.mark_as_complete()
        only1 = topic.consumer("c1", targets=[1])
        evs = list(only1)
        assert len(evs) == 4
        assert all(ev.partition == 1 for ev in evs)

    def test_destroy_clears_state(self, driver, backend):
        topic = driver.create_topic(f"bk-destroy-{backend}", num_partitions=1, backend=backend)
        with topic.producer("p") as prod:
            prod.push({"n": 1})
        driver.destroy_topic(topic.name)
        assert not driver.topic_exists(topic.name)
        # recreating starts empty at offset 0
        topic2 = driver.create_topic(topic.name, num_partitions=1, backend=backend)
        with topic2.producer("p") as prod:
            fut = prod.push({"n": 2})
        assert fut.wait() == 0


class TestMemoryBackendSpecifics:
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

    def test_stream_read_rejected(self, driver):
        topic = driver.create_topic("mem-nostream", backend="memory")
        with pytest.raises(MofkaError):
            topic.read_stream()

    def test_unknown_backend_rejected(self, driver):
        with pytest.raises(MofkaError):
            driver.create_topic("bad-backend", backend="rocksdb")
