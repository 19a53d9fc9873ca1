"""Retention/expiry (EventLog.trim) conformance.

The reference log has no retention — this is beyond-reference
lifecycle work (r12 verdict #1): a 100 TB event log must be able to
retire old data. Contract under test:

- trim(before_offset=k): readable log becomes exactly [k, head) per
  partition; whole files under the floor are deleted; straddling
  files' below-floor rows are hidden by every reader.
- trim(before_ts=t): Kafka log-segment semantics at whole-file
  granularity (a file with ANY newer row survives intact).
- offsets stay dense above the floor; retired offsets are never
  reused — appends after a full trim continue at the old head, even
  through ledger recovery.
- consumer cursors fence the trim (force=True overrides).
- crash safety: floors commit atomically BEFORE deletion; a kill
  anywhere mid-trim leaves reads consistent and a re-run finishes.
- the streaming source resumes past a trim (no retired offsets, no
  duplicates, no lost rows).
- retention.ms from the Kafka facade config is honored
  (TopicHandle.apply_retention), other config keys warn.
"""

import datetime
import json
import os
import subprocess
import sys
import time

import pytest

from mofka_spark.errors import MofkaError

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mk_log(root, n_per_part=10, parts=2, batch=1):
    """A bare file-backed EventLog (no Spark) with n_per_part events
    per partition, written ``batch`` events per file."""
    from mofka_spark.log import EventLog

    log = EventLog(None, root, "t-trim")
    for base in range(0, n_per_part, batch):
        rows = [
            (p, i, json.dumps({"i": base + i, "p": p}), None)
            for p in range(parts)
            for i in range(min(batch, n_per_part - base))
        ]
        log.append_rows(rows)
    return log


def _offsets(log, p=None):
    rows = log.fetch_rows({}, 10**9)
    return sorted(off for part, off, _m, _d in rows if p is None or part == p)


def _files(log, p):
    pdir = os.path.join(log.data_path, f"partition={p}")
    if not os.path.isdir(pdir):
        return []
    return sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))


class TestTrimOffset:
    def test_readable_log_is_floor_to_head(self, tmp_path):
        log = _mk_log(str(tmp_path / "t"), n_per_part=10, batch=2)
        assert log.trim(before_offset=5) == {0: 5, 1: 5}
        for p in (0, 1):
            assert _offsets(log, p) == list(range(5, 10))
        assert log.trim_floors() == {0: 5, 1: 5}

    def test_whole_files_below_floor_deleted(self, tmp_path):
        # 2-event files: floor 5 deletes files [0,1],[2,3]; file [4,5]
        # straddles and survives with offset 4 hidden
        log = _mk_log(str(tmp_path / "t"), n_per_part=10, batch=2)
        n_before = len(_files(log, 0))
        log.trim(before_offset=5)
        assert len(_files(log, 0)) == n_before - 2
        assert _offsets(log, 0) == [5, 6, 7, 8, 9]

    def test_floor_clamps_to_head_and_never_decreases(self, tmp_path):
        log = _mk_log(str(tmp_path / "t"), n_per_part=10)
        assert log.trim(before_offset=10**9) == {0: 10, 1: 10}
        assert _offsets(log) == []
        # a lower request never moves the floor down
        assert log.trim(before_offset=3) == {0: 10, 1: 10}

    def test_partition_subset(self, tmp_path):
        log = _mk_log(str(tmp_path / "t"), n_per_part=10)
        assert log.trim(before_offset=4, partitions=[1]) == {1: 4}
        assert _offsets(log, 0) == list(range(10))
        assert _offsets(log, 1) == list(range(4, 10))

    def test_appends_stay_dense_above_floor(self, tmp_path):
        log = _mk_log(str(tmp_path / "t"), n_per_part=10)
        log.trim(before_offset=10**9)  # full trim: floor == head == 10
        acks = log.append_rows([(0, 0, json.dumps({"i": 99}), None)])
        assert acks[0] == (10, 1)  # retired offsets never reused
        assert _offsets(log, 0) == [10]

    def test_recovery_preserves_floor_after_full_trim(self, tmp_path):
        # crash that loses the ledger: recover_ledger has no rows to
        # scan on a fully-trimmed partition — the floor must still pin
        # the next offset
        from mofka_spark.log import EventLog

        root = str(tmp_path / "t")
        log = _mk_log(root, n_per_part=6)
        log.trim(before_offset=10**9)
        ledger = json.load(open(log.ledger_path))
        ledger["offsets"] = {}  # simulate a stale/emptied offsets map
        with open(log.ledger_path, "w") as f:
            json.dump(ledger, f)
        fresh = EventLog(None, root, "t-trim")
        acks = fresh.append_rows([(0, 0, json.dumps({"i": 1}), None)])
        assert acks[0][0] == 6

    def test_exactly_one_cut_required(self, tmp_path):
        log = _mk_log(str(tmp_path / "t"), n_per_part=2)
        with pytest.raises(MofkaError):
            log.trim()
        with pytest.raises(MofkaError):
            log.trim(before_offset=1, before_ts="2026-01-01T00:00:00+00:00")


class TestTrimTimestamp:
    def test_file_granularity_prefix(self, tmp_path):
        from mofka_spark.log import EventLog

        root = str(tmp_path / "t")
        log = EventLog(None, root, "t-trim")
        log.append_rows([(0, i, json.dumps({"i": i}), None) for i in range(4)])
        cut = datetime.datetime.now(datetime.timezone.utc)
        time.sleep(0.01)
        log.append_rows(
            [(0, i, json.dumps({"i": 4 + i}), None) for i in range(4)]
        )
        assert log.trim(before_ts=cut) == {0: 4}
        assert _offsets(log, 0) == [4, 5, 6, 7]

    def test_file_with_newer_row_survives_whole(self, tmp_path):
        # one file spanning the cut: nothing trims (kafka segment rule)
        from mofka_spark.log import EventLog

        root = str(tmp_path / "t")
        log = EventLog(None, root, "t-trim")
        log.append_rows([(0, i, json.dumps({"i": i}), None) for i in range(8)])
        cut = datetime.datetime.now(datetime.timezone.utc)
        assert log.trim(before_ts=cut - datetime.timedelta(seconds=60)) == {0: 0}
        assert _offsets(log, 0) == list(range(8))

    def test_iso_string_cut(self, tmp_path):
        log = _mk_log(str(tmp_path / "t"), n_per_part=3, parts=1)
        future = (
            datetime.datetime.now(datetime.timezone.utc)
            + datetime.timedelta(days=1)
        ).isoformat()
        assert log.trim(before_ts=future) == {0: 3}
        assert _offsets(log, 0) == []


class TestCursorFence:
    def test_fences_unread_events(self, tmp_path):
        log = _mk_log(str(tmp_path / "t"), n_per_part=10, parts=1)
        log.acknowledge("c1", 0, 2)  # cursor -> 3
        with pytest.raises(MofkaError, match="c1"):
            log.trim(before_offset=5)
        # at the cursor: only READ data trimmed — allowed
        assert log.trim(before_offset=3) == {0: 3}

    def test_force_overrides_and_consumer_resumes_at_floor(self, tmp_path):
        log = _mk_log(str(tmp_path / "t"), n_per_part=10, parts=1)
        log.acknowledge("c1", 0, 2)
        assert log.trim(before_offset=5, force=True) == {0: 5}
        rows = log.fetch_rows(log.load_cursors("c1"), 3)
        assert [off for _p, off, _m, _d in rows] == [5, 6, 7]

    def test_fence_only_on_floor_increase(self, tmp_path):
        # After a force trim past a lagging consumer's cursor, later
        # NON-force trims that do not raise any floor must succeed —
        # the committed floor destroys nothing new, and the documented
        # crash-recovery path ("re-running trim completes the
        # deletion") plus Driver.apply_retention sweeps depend on it.
        log = _mk_log(str(tmp_path / "t"), n_per_part=10, parts=1)
        log.acknowledge("c1", 0, 2)  # cursor -> 3
        assert log.trim(before_offset=5, force=True) == {0: 5}
        # unchanged floor: allowed even though floor(5) > cursor(3)
        assert log.trim(before_offset=5) == {0: 5}
        assert log.trim(before_offset=1) == {0: 5}  # below floor: noop
        # an actual INCREASE past the cursor still fences
        with pytest.raises(MofkaError, match="c1"):
            log.trim(before_offset=7)
        # consumer catches up -> the increase is allowed
        log.acknowledge("c1", 0, 6)
        assert log.trim(before_offset=7) == {0: 7}


class TestCrashSafety:
    def test_crash_window_reads_consistent_and_rerun_completes(self, tmp_path):
        # the exact mid-trim crash state: floors committed, deletion
        # not yet done (trim commits the ledger FIRST)
        from mofka_spark.log import EventLog

        root = str(tmp_path / "t")
        log = _mk_log(root, n_per_part=10, parts=1, batch=2)
        ledger = json.load(open(log.ledger_path))
        ledger["trim"] = {"0": 6}
        with open(log.ledger_path, "w") as f:
            json.dump(ledger, f)
        fresh = EventLog(None, root, "t-trim")
        # reads honor the floor even though the files still exist
        assert _offsets(fresh, 0) == [6, 7, 8, 9]
        n_files = len(_files(fresh, 0))
        # any later trim finishes the deletion
        fresh.trim(before_offset=0)
        assert len(_files(fresh, 0)) < n_files
        assert _offsets(fresh, 0) == [6, 7, 8, 9]

    def test_sigkill_mid_trim_cycle(self, tmp_path):
        # a real child killed in an append+trim loop, at whatever
        # instruction it happens to execute; after each kill a fresh
        # log must read a consistent [floor, head) window and keep
        # appending densely
        child_src = r"""
import json, os, sys
sys.path.insert(0, sys.argv[3])
from mofka_spark.log import EventLog
root, progress = sys.argv[1], sys.argv[2]
log = EventLog(None, root, "t-trim")
pf = open(progress, "a", buffering=1)
i = int(sys.argv[4])
while True:
    log.append_rows([(0, 0, json.dumps({"i": i}), None)])
    if i % 3 == 2:
        log.trim(before_offset=max(0, i - 4), force=True)
    pf.write(f"{i}\n"); pf.flush(); os.fsync(pf.fileno())
    i += 1
"""
        from mofka_spark.log import EventLog

        root = str(tmp_path / "t")
        progress = str(tmp_path / "progress")
        os.makedirs(root, exist_ok=True)
        start = 0
        for _round in range(2):
            child = subprocess.Popen(
                [sys.executable, "-c", child_src, root, progress, REPO,
                 str(start)],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            try:
                t0 = time.time()
                while True:
                    acked = (
                        open(progress).read().split()
                        if os.path.exists(progress) else []
                    )
                    if len(acked) >= start + 12:
                        break
                    assert time.time() - t0 < 60, "child stalled"
                    time.sleep(0.02)
            finally:
                child.kill()
                child.wait()
            acked = [int(x) for x in open(progress).read().split()]
            log = EventLog(None, root, "t-trim")
            floor = log.trim_floors().get(0, 0)
            offs = _offsets(log, 0)
            # consistent window: dense from >= floor up to the head
            assert offs == list(range(offs[0], offs[0] + len(offs)))
            assert offs[0] >= floor
            # every ACKED event above the floor is readable
            assert offs[-1] >= max(acked)
            acks = log.append_rows(
                [(0, 0, json.dumps({"i": -1}), None)]
            )
            assert acks[0][0] == offs[-1] + 1
            start = max(acked) + 2  # the marker took one offset


class TestReadersRespectFloor:
    def test_spark_read_and_read_tail(self, spark, tmp_path):
        from mofka_spark.log import EventLog

        root = str(tmp_path / "t")
        _mk_log(root, n_per_part=10, batch=2)
        log = EventLog(spark, root, "t-trim")
        log.trim(before_offset=5)
        got = sorted(
            (r["partition"], r["offset"]) for r in log.read().collect()
        )
        assert got == [(p, o) for p in (0, 1) for o in range(5, 10)]
        tail = log.read_tail({}, 2)
        got = sorted(
            (r["partition"], r["offset"]) for r in tail.collect()
        )
        assert got == [(0, 5), (0, 6), (1, 5), (1, 6)]

    def test_streaming_resume_past_trim(self, spark, tmp_path):
        from mofka_spark.client import Driver

        root = str(tmp_path / "root")
        drv = Driver(spark, root)
        t = drv.create_topic("s", num_partitions=1)
        out = str(tmp_path / "out")
        ck = str(tmp_path / "ck")

        def drain():
            q = (
                t.read_stream()
                .writeStream.format("parquet").option("path", out)
                .option("checkpointLocation", ck)
                .outputMode("append").trigger(availableNow=True).start()
            )
            q.awaitTermination(120)
            return sorted(
                r["offset"] for r in spark.read.parquet(out).collect()
            )

        with t.producer("p", batch_size=5) as p:
            for i in range(10):
                p.push({"i": i}, None, partition=0)
        assert drain() == list(range(10))
        t.trim(before_offset=8)
        with t.producer("p2", batch_size=5) as p:
            for i in range(10, 15):
                p.push({"i": i}, None, partition=0)
        # resume: exactly the new rows — no duplicates, no retired
        # offsets re-delivered
        assert drain() == list(range(15))

    def test_fresh_stream_starts_at_floor(self, spark, tmp_path):
        from mofka_spark.client import Driver

        root = str(tmp_path / "root")
        drv = Driver(spark, root)
        t = drv.create_topic("s2", num_partitions=1)
        with t.producer("p", batch_size=5) as p:
            for i in range(10):
                p.push({"i": i}, None, partition=0)
        t.trim(before_offset=7)
        t.mark_as_complete()
        q = (
            t.read_stream()
            .writeStream.format("memory").queryName("trim_fresh")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = sorted(
            r["offset"]
            for r in spark.sql("select offset from trim_fresh").collect()
        )
        assert got == [7, 8, 9]


class TestMemoryBackend:
    def test_trim_memory_store(self, spark, tmp_path):
        from mofka_spark.client import Driver

        drv = Driver(spark, str(tmp_path / "root"))
        t = drv.create_topic("m", num_partitions=1, backend="memory")
        with t.producer("p", batch_size=10) as p:
            for i in range(10):
                p.push({"i": i}, None, partition=0)
        assert t.trim(before_offset=4) == {0: 4}
        assert sorted(
            r["offset"] for r in t.log.read().collect()
        ) == list(range(4, 10))
        rows = t.log.fetch_rows({}, 3)
        assert [off for _p, off, _m, _d in rows] == [4, 5, 6]
        # appends continue at the head, not the floor
        with t.producer("p", batch_size=10) as p:
            p.push({"i": 99}, None, partition=0)
        assert t.log.next_offsets()[0] == 11

    def test_mixed_topic_routes_trim(self, spark, tmp_path):
        from mofka_spark.client import Driver

        drv = Driver(spark, str(tmp_path / "root"))
        t = drv.create_topic(
            "mx", num_partitions=2, partition_backends=["default", "memory"]
        )
        with t.producer("p", batch_size=10) as p:
            for i in range(10):
                p.push({"i": i}, None, partition=i % 2)
        assert t.trim(before_offset=3) == {0: 3, 1: 3}
        got = sorted(
            (r["partition"], r["offset"]) for r in t.log.read().collect()
        )
        assert got == [(p, o) for p in (0, 1) for o in range(3, 5)]


class TestKafkaRetention:
    def test_apply_retention_honors_retention_ms(self, spark, tmp_path):
        from mofka_spark.kafka import KafkaDriver

        root = str(tmp_path / "root")
        os.makedirs(root)
        cfg = str(tmp_path / "kafka.json")
        with open(cfg, "w") as f:
            json.dump({"root": root}, f)
        kd = KafkaDriver(cfg, spark)
        kd.create_topic(
            "kt", num_partitions=1, config={"retention.ms": 3_600_000}
        )
        t = kd.open_topic("kt")
        with t.producer("p", batch_size=5) as p:
            for i in range(5):
                p.push({"i": i}, None, partition=0)
        # within the window: nothing trims
        assert t.apply_retention() == {0: 0}
        assert t.log.read().count() == 5
        # a "now" past the window trims everything (injectable clock)
        fut = datetime.datetime.now(
            datetime.timezone.utc
        ) + datetime.timedelta(days=1)
        assert t.apply_retention(now=fut) == {0: 5}
        assert t.log.read().count() == 0

    def test_no_retention_config_is_noop(self, spark, tmp_path):
        from mofka_spark.client import Driver

        drv = Driver(spark, str(tmp_path / "root"))
        t = drv.create_topic("plain", num_partitions=1)
        assert t.apply_retention() == {}

    def test_unhonored_config_keys_warn(self, spark, tmp_path, caplog):
        import logging

        from mofka_spark.kafka import KafkaDriver

        root = str(tmp_path / "root")
        os.makedirs(root)
        cfg = str(tmp_path / "kafka.json")
        with open(cfg, "w") as f:
            json.dump({"root": root}, f)
        kd = KafkaDriver(cfg, spark)
        with caplog.at_level(logging.WARNING, logger="mofka_spark.kafka"):
            kd.create_topic(
                "warned", num_partitions=1,
                config={"retention.ms": 1000, "cleanup.policy": "compact"},
            )
        assert any("cleanup.policy" in r.getMessage() for r in caplog.records)
        # honored key alone: silent
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger="mofka_spark.kafka"):
            kd.create_topic(
                "silent", num_partitions=1, config={"retention.ms": 1000}
            )
        assert not caplog.records

    def test_bad_retention_ms_rejected(self, spark, tmp_path):
        from mofka_spark.kafka import KafkaDriver

        root = str(tmp_path / "root")
        os.makedirs(root)
        cfg = str(tmp_path / "kafka.json")
        with open(cfg, "w") as f:
            json.dump({"root": root}, f)
        kd = KafkaDriver(cfg, spark)
        for bad in (0, -5, "soon", True):
            with pytest.raises(MofkaError):
                kd.create_topic(
                    f"bad-{bad}", num_partitions=1,
                    config={"retention.ms": bad},
                )

    def test_retention_ms_minus_one_is_infinite(self, spark, tmp_path):
        # Kafka defines retention.ms=-1 as infinite retention; the
        # facade must accept it and apply_retention must never trim
        from mofka_spark.kafka import KafkaDriver

        root = str(tmp_path / "root")
        os.makedirs(root)
        cfg = str(tmp_path / "kafka.json")
        with open(cfg, "w") as f:
            json.dump({"root": root}, f)
        kd = KafkaDriver(cfg, spark)
        kd.create_topic("inf", num_partitions=1, config={"retention.ms": -1})
        t = kd.open_topic("inf")
        with t.producer("p", batch_size=3) as p:
            for i in range(3):
                p.push({"i": i}, None, partition=0)
        fut = datetime.datetime.now(
            datetime.timezone.utc
        ) + datetime.timedelta(days=365)
        assert t.apply_retention(now=fut) == {}
        assert t.log.read().count() == 3


class TestTrimCli:
    def test_topic_trim_before_offset(self, tmp_path):
        from mofka_spark.registry import TopicRegistry

        root = str(tmp_path / "root")
        reg = TopicRegistry(root)
        reg.create_topic("t", num_partitions=1)
        _mk_log(reg.topic_path("t"), n_per_part=6, parts=1)
        proc = subprocess.run(
            [sys.executable, "-m", "mofka_spark", "topic", "trim", "t",
             "-r", root, "--before-offset", "4"],
            capture_output=True, text=True, cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr
        assert json.loads(proc.stdout.strip()) == {"0": 4}

    def test_topic_trim_retention_from_config(self, tmp_path):
        # CLI honors the persisted Kafka retention.ms; a huge window
        # trims nothing — exercises the config plumbing end to end
        from mofka_spark.registry import TopicRegistry

        root = str(tmp_path / "root")
        reg = TopicRegistry(root)
        reg.create_topic(
            "t", num_partitions=1,
            extra={"kafka": {"config": {"retention.ms": 86_400_000}}},
        )
        _mk_log(reg.topic_path("t"), n_per_part=4, parts=1)
        proc = subprocess.run(
            [sys.executable, "-m", "mofka_spark", "topic", "trim", "t",
             "-r", root, "--retention"],
            capture_output=True, text=True, cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr
        assert json.loads(proc.stdout.strip()) == {"0": 0}

    def test_requires_exactly_one_cut(self, tmp_path):
        from mofka_spark.registry import TopicRegistry

        root = str(tmp_path / "root")
        TopicRegistry(root).create_topic("t", num_partitions=1)
        proc = subprocess.run(
            [sys.executable, "-m", "mofka_spark", "topic", "trim", "t",
             "-r", root],
            capture_output=True, text=True, cwd=REPO,
        )
        assert proc.returncode != 0


class TestDriverRetentionSweep:
    def test_sweep_trims_only_configured_topics(self, spark, tmp_path):
        from mofka_spark.client import Driver
        from mofka_spark.kafka import KafkaDriver

        root = str(tmp_path / "root")
        os.makedirs(root)
        cfg = str(tmp_path / "kafka.json")
        with open(cfg, "w") as f:
            json.dump({"root": root}, f)
        kd = KafkaDriver(cfg, spark)
        kd.create_topic("kept", num_partitions=1)  # no retention config
        kd.create_topic(
            "expiring", num_partitions=1, config={"retention.ms": 60_000}
        )
        drv = Driver(spark, root)
        for name in ("kept", "expiring"):
            t = drv.open_topic(name)
            with t.producer("p", batch_size=4) as p:
                for i in range(4):
                    p.push({"i": i}, None, partition=0)
        fut = datetime.datetime.now(
            datetime.timezone.utc
        ) + datetime.timedelta(days=1)
        floors = drv.apply_retention(now=fut)
        assert floors == {"expiring": {0: 4}}
        assert drv.open_topic("kept").log.read().count() == 4
        assert drv.open_topic("expiring").log.read().count() == 0


class TestTrimCompactInterplay:
    def test_compact_then_trim_then_compact(self, tmp_path):
        # per-flush files -> trim (deletes a prefix, hides part of a
        # straddling file) -> compaction merges the survivors -> reads
        # stay exactly [floor, head) and a later trim still works
        log = _mk_log(str(tmp_path / "t"), n_per_part=12, parts=1, batch=2)
        log.trim(before_offset=5)
        res = log.compact_files(min_files=2)
        assert res[0][1] < res[0][0]
        assert _offsets(log, 0) == list(range(5, 12))
        # the merged file straddles the floor (it kept offset 4's row
        # on disk); a second trim above it re-hides correctly
        assert log.trim(before_offset=8) == {0: 8}
        assert _offsets(log, 0) == list(range(8, 12))

    def test_trim_after_compaction_deletes_merged_file(self, tmp_path):
        log = _mk_log(str(tmp_path / "t"), n_per_part=8, parts=1, batch=2)
        log.compact_files(min_files=2)  # one merged file [0,8)
        assert len(_files(log, 0)) == 1
        # floor above the whole file: deletion removes it outright
        log.trim(before_offset=10**9)
        assert _files(log, 0) == []
        assert _offsets(log, 0) == []
        acks = log.append_rows([(0, 0, json.dumps({"i": 1}), None)])
        assert acks[0][0] == 8
