"""Write-through batch cache conformance.

Mirrors /root/reference/tests/MofkaWriteCacheTest.cpp:14-60 (produce
100 events with the cache enabled, consume and verify ids/metadata/
data — the reads should hit the cache) and its second section
(ack_early + write cache). The cache is WRITE-THROUGH: every acked
event is durable before it is cached, so crash recovery is identical
with and without it (reference default-partition-design.md
§Write-Through Batch Cache).
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from mofka_spark.errors import MofkaError
from mofka_spark.log import EventLog, WriteCache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NUM_EVENTS = 100


def _produce(topic, n=NUM_EVENTS, **producer_kwargs):
    with topic.producer("myproducer", **producer_kwargs) as p:
        for i in range(n):
            p.push({"event_num": i}, f"Write-cache data for event {i}".encode())


def _consume_verify(topic, n=NUM_EVENTS):
    """Reference loop: pull n events, check id/metadata/data per event."""
    c = topic.consumer("myconsumer")
    for i in range(n):
        ev = c.pull()
        assert ev.id == i
        assert ev.metadata["event_num"] == i
        assert ev.data == f"Write-cache data for event {i}".encode()


def test_produce_consume_write_cache(driver):
    # MofkaWriteCacheTest section 1: large max_batches so nothing evicts
    t = driver.create_topic(
        "mytopic", num_partitions=1,
        write_cache={"enabled": True, "max_batches": 1024,
                     "max_memory_bytes": 67108864},
    )
    _produce(t)
    t.mark_as_complete()
    _consume_verify(t)
    stats = t.write_cache_stats()
    assert stats is not None
    assert stats["evictions"] == 0
    assert stats["hits"] > 0          # reads were served from memory
    assert stats["misses"] == 0       # every pulled range was covered


def test_ack_early_plus_write_cache(driver):
    # MofkaWriteCacheTest section 2: ack_early producer, cache enabled
    t = driver.create_topic(
        "mytopic2", num_partitions=1,
        write_cache={"enabled": True, "max_batches": 1024},
    )
    _produce(t, ack_early=True)
    t.mark_as_complete()
    _consume_verify(t)
    stats = t.write_cache_stats()
    assert stats["hits"] > 0 and stats["misses"] == 0


def test_cache_disabled_reads_from_disk(driver):
    t = driver.create_topic(
        "nocache", num_partitions=2, write_cache={"enabled": False}
    )
    _produce(t)
    t.mark_as_complete()
    assert t.write_cache_stats() is None
    # correctness is unchanged — events come back dense per partition
    c = t.consumer("c")
    seen = {0: [], 1: []}
    for _ in range(NUM_EVENTS):
        ev = c.pull()
        seen[ev.partition].append(ev.offset)
    for offs in seen.values():
        assert offs == list(range(len(offs)))


def test_default_is_enabled(driver):
    # reference: write_cache.enabled defaults to true
    t = driver.create_topic("defaults")
    _produce(t, n=10)
    t.mark_as_complete()
    _consume_verify(t, n=10)
    stats = t.write_cache_stats()
    assert stats is not None and stats["hits"] > 0


def test_fifo_eviction_max_batches(driver):
    # one flush per push => one cached batch per event
    t = driver.create_topic(
        "evict", num_partitions=1, write_cache={"max_batches": 3}
    )
    with t.producer("p", batch_size=1) as prod:
        for i in range(10):
            prod.push({"event_num": i}, bytes([i]))
    t.mark_as_complete()
    stats = t.write_cache_stats()
    assert stats["cached_batches"] <= 3
    assert stats["evictions"] == 7
    # evicted offsets still read correctly (write-through => on disk);
    # batch_size=4 makes the first pulls span uncached offsets -> miss
    c = t.consumer("c", batch_size=4)
    for i in range(10):
        ev = c.pull()
        assert ev.id == i and ev.data == bytes([i])
    assert t.write_cache_stats()["misses"] > 0


def test_memory_bytes_eviction():
    wc = WriteCache(max_batches=100, max_memory_bytes=100)
    wc.insert(0, 0, [("m" * 30, b"x" * 30)])   # 60 bytes
    wc.insert(0, 1, [("m" * 30, b"x" * 30)])   # 120 -> evict oldest
    assert wc.stats()["cached_batches"] == 1
    assert wc.stats()["evictions"] == 1
    assert wc.get_range(0, 0, 1) is None       # evicted
    assert wc.get_range(0, 1, 2) is not None   # newest retained
    # a single batch larger than the limit evicts itself (fixpoint)
    wc.insert(1, 0, [("m" * 200, b"")])
    assert wc.stats()["cached_batches"] == 0


def test_partial_coverage_is_a_miss():
    wc = WriteCache()
    wc.insert(0, 5, [("a", b"1"), ("b", b"2")])  # covers [5, 7)
    assert wc.get_range(0, 5, 7) == [(5, "a", b"1"), (6, "b", b"2")]
    assert wc.get_range(0, 4, 7) is None  # 4 uncovered
    assert wc.get_range(0, 6, 8) is None  # 7 uncovered
    assert wc.get_range(1, 5, 7) is None  # other partition
    assert wc.get_range(0, 3, 3) == []    # empty range: neither hit nor miss


def test_cross_batch_assembly():
    wc = WriteCache()
    wc.insert(0, 0, [("a", None), ("b", b"2")])
    wc.insert(0, 2, [("c", b"3")])
    got = wc.get_range(0, 0, 3)
    assert got == [(0, "a", None), (1, "b", b"2"), (2, "c", b"3")]


def test_none_metadata_insert():
    # the row tuple type is (metadata: str | None, data: bytes | None);
    # insert must size-account a None metadata instead of crashing
    # inside the ledger lock after the durable write
    wc = WriteCache()
    wc.insert(0, 0, [(None, b"12"), ("m", None)])
    assert wc.get_range(0, 0, 2) == [(0, None, b"12"), (1, "m", None)]
    assert wc.stats()["cached_bytes"] == 3  # 2 data + 1 metadata


def test_config_validation(driver):
    for bad in (
        {"enabled": "yes"},
        {"max_batches": 0},
        {"max_batches": 2.5},
        {"max_memory_bytes": -1},
        {"max_memory_bytes": True},
        {"bogus_key": 1},
        "enabled",
    ):
        with pytest.raises(MofkaError):
            driver.create_topic(f"bad-{hash(str(bad))}", write_cache=bad)


def test_config_survives_reopen(driver):
    driver.create_topic("persisted", write_cache={"max_batches": 7})
    t2 = driver.open_topic("persisted")
    assert t2.log.write_cache is not None
    assert t2.log.write_cache.max_batches == 7


# -- crash interaction ------------------------------------------------------
# The cache never relaxes durability: a child process producing WITH the
# cache enabled is SIGKILLed mid-loop; every event it saw acked must be
# readable by a fresh (cold-cache) log, exactly as in test_crash_kill.

CHILD = r"""
import json, os, sys
sys.path.insert(0, sys.argv[3])
from mofka_spark.log import EventLog

root, progress = sys.argv[1], sys.argv[2]
log = EventLog(None, root, "t-wc", write_cache={"max_batches": 8})
pf = open(progress, "a", buffering=1)
i = 0
while True:
    log.append_rows([(0, 0, json.dumps({"i": i}), bytes([i % 256]))])
    pf.write(f"{i}\n")
    pf.flush()
    os.fsync(pf.fileno())
    i += 1
"""


def test_sigkill_with_cache_loses_nothing(spark, tmp_path):
    root, progress = str(tmp_path / "t"), str(tmp_path / "progress")
    os.makedirs(root, exist_ok=True)
    child = subprocess.Popen(
        [sys.executable, "-c", CHILD, root, progress, REPO],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + 30
    while time.time() < deadline:
        if os.path.exists(progress) and os.path.getsize(progress) > 20:
            break
        time.sleep(0.05)
    child.send_signal(signal.SIGKILL)
    child.wait()
    acked = [int(x) for x in open(progress).read().split()]
    assert acked, "child never acked an event"
    # fresh log = cold cache; recovery + reads come from disk only
    log = EventLog(spark, root, "t-wc", write_cache={"max_batches": 8})
    log.recover_ledger()
    rows = log.fetch_rows({0: 0}, batch_size=len(acked) + 10)
    got = {off: json.loads(meta)["i"] for _p, off, meta, _d in rows}
    for i in acked:
        assert got.get(i) == i, f"acked event {i} lost after SIGKILL"
    assert log.write_cache.stats()["hits"] == 0  # cold cache, disk-served
