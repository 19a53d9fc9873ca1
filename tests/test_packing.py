"""pack_sequences / compact_latest operator tests."""

import pytest
from pyspark.sql import functions as F

from mofka_spark import plans
from mofka_spark.operators import packing

SF = "/root/testdata/sf0.001"


class TestPackSequences:
    def test_layout(self, spark):
        rows = [(1, 10), (2, 20), (3, 5), (4, 100)]
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
        out = {
            r.id: r
            for r in packing.pack_sequences(
                df, id_col="doc_id", capacity=32
            ).collect()
        }
        # doc 1: [0, 10)   -> bin 0
        assert (out[1].global_start, out[1].first_bin, out[1].last_bin) == (0, 0, 0)
        # doc 2: [10, 30)  -> bin 0
        assert (out[2].global_start, out[2].first_bin, out[2].last_bin) == (10, 0, 0)
        # doc 3: [30, 35)  -> straddles bins 0-1
        assert (out[3].global_start, out[3].first_bin, out[3].last_bin) == (30, 0, 1)
        assert out[3].start_in_bin == 30
        # doc 4: [35, 135) -> bins 1-4
        assert (out[4].first_bin, out[4].last_bin) == (1, 4)

    def test_matches_single_partition_prefix_sum(self, spark):
        rows = [(i, (i * 37) % 90 + 1) for i in range(200)]
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens"]).repartition(7)
        out = packing.pack_sequences(df, capacity=64, num_ranges=5).collect()
        got = {r.id: r.global_start for r in out}
        acc = 0
        for i, n in rows:
            assert got[i] == acc, f"doc {i}"
            acc += n

    def test_empty(self, spark):
        df = spark.createDataFrame([], "doc_id long, n_tokens long")
        assert packing.pack_sequences(df).count() == 0

    def test_invalid_capacity(self, spark):
        df = spark.createDataFrame([(1, 2)], ["doc_id", "n_tokens"])
        with pytest.raises(ValueError):
            packing.pack_sequences(df, capacity=0)

    def test_no_global_window(self, spark):
        # the plan must not contain a partition-less (global) window —
        # the whole point is the distributed prefix sum
        df = spark.createDataFrame([(1, 2)], ["doc_id", "n_tokens"])
        p = plans.plan_string(packing.pack_sequences(df))
        for line in p.splitlines():
            if "Window" in line:
                assert "partitionBy" not in line or "_pid" in line


class TestCompactLatest:
    def test_latest_wins(self, spark):
        rows = [
            (1, 10, 100, "a", 1.0),
            (1, 20, 101, "b", 2.0),
            (2, 10, 102, "c", 3.0),
            (1, 20, 99, "old-tie", 9.0),  # same ts, lower id loses
        ]
        df = spark.createDataFrame(
            rows, ["user_id", "ts", "event_id", "event_type", "value"]
        )
        out = {
            r.user_id: r
            for r in packing.compact_latest(
                df, ["user_id"], ["ts", "event_id"], ["event_type", "value"]
            ).collect()
        }
        assert (out[1].ts, out[1].event_id, out[1].event_type) == (20, 101, "b")
        assert out[2].event_type == "c"

    def test_partial_aggregation(self, spark):
        df = spark.createDataFrame(
            [(1, 1, 1, "a", 0.0)],
            ["user_id", "ts", "event_id", "event_type", "value"],
        )
        p = plans.plan_string(
            packing.compact_latest(
                df, ["user_id"], ["ts", "event_id"], ["event_type", "value"]
            )
        )
        assert "partial_" in p  # map-side combine before the exchange
        assert "Window" not in p


class TestEpochShuffle:
    def test_dense_permutation_and_determinism(self, spark):
        from mofka_spark.operators import packing

        df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
        a = packing.epoch_shuffle(df, seed=1).collect()
        # dense 0..N-1, each id exactly once
        assert sorted(r.epoch_pos for r in a) == list(range(100))
        assert len({r.id for r in a}) == 100
        # same seed -> identical order; different seed -> different order
        b = {r.id: r.epoch_pos for r in packing.epoch_shuffle(df, seed=1).collect()}
        c = {r.id: r.epoch_pos for r in packing.epoch_shuffle(df, seed=2).collect()}
        a_map = {r.id: r.epoch_pos for r in a}
        assert a_map == b
        assert a_map != c
        # position = rank of (shuffle_key, id): spot-check monotonicity
        by_pos = sorted(a, key=lambda r: r.epoch_pos)
        keys = [(r.shuffle_key, r.id) for r in by_pos]
        assert keys == sorted(keys)

    def test_empty_input(self, spark):
        from mofka_spark.operators import packing

        df = spark.range(0, 0).withColumnRenamed("id", "doc_id")
        assert packing.epoch_shuffle(df).count() == 0

    def test_no_global_single_partition_window(self, spark):
        from mofka_spark import plans
        from mofka_spark.operators import packing

        df = spark.range(0, 50).withColumnRenamed("id", "doc_id")
        p = plans.plan_string(packing.epoch_shuffle(df))
        assert "SinglePartition" not in p


class TestExportShards:
    def test_id_order_shards(self, spark, tmp_path):
        from mofka_spark.operators.packing import export_shards

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        n = docs.count()
        path = str(tmp_path / "shards-id")
        manifest = export_shards(docs, path, shard_rows=64).collect()
        assert sum(r["n_rows"] for r in manifest) == n
        # every shard but the last holds exactly shard_rows rows, and
        # positions tile [0, n) contiguously in shard order
        for i, r in enumerate(manifest):
            assert r["shard"] == i
            assert r["first_pos"] == i * 64
            if i < len(manifest) - 1:
                assert r["n_rows"] == 64 and r["last_pos"] == i * 64 + 63
        back = spark.read.parquet(path)
        rows = back.orderBy("epoch_pos").select("doc_id").collect()
        ids = [r["doc_id"] for r in rows]
        assert ids == sorted(ids)  # id order IS the global order

    def test_seeded_shuffle_is_permutation_and_deterministic(self, spark, tmp_path):
        from mofka_spark.operators.packing import export_shards

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
        export_shards(docs, p1, shard_rows=100, seed=7)
        export_shards(docs, p2, shard_rows=100, seed=7)
        a = [
            r["doc_id"]
            for r in spark.read.parquet(p1).orderBy("epoch_pos").collect()
        ]
        b = [
            r["doc_id"]
            for r in spark.read.parquet(p2).orderBy("epoch_pos").collect()
        ]
        assert a == b  # same seed -> byte-identical training order
        assert sorted(a) == sorted(
            r["doc_id"] for r in docs.select("doc_id").collect()
        )
        c = [
            r["doc_id"]
            for r in export_shards(
                docs, str(tmp_path / "s3"), shard_rows=100, seed=8
            ).sparkSession.read.parquet(str(tmp_path / "s3"))
            .orderBy("epoch_pos")
            .collect()
        ]
        assert c != a  # a new seed is a new permutation


class TestPackManifest:
    def test_spans_tile_every_window_exactly(self, spark):
        from mofka_spark.operators.packing import pack_manifest

        # docs of 3,4,5,2 tokens, capacity 4: stream = 14 tokens over
        # 4 windows (last partial)
        df = spark.createDataFrame(
            [(1, 3), (2, 4), (3, 5), (4, 2)], ["doc_id", "n_tokens"]
        )
        rows = pack_manifest(df, capacity=4).collect()
        # per window, spans are disjoint, ordered, and sum to the
        # window's fill
        by_bin: dict = {}
        for r in rows:
            by_bin.setdefault(r.bin, []).append(r)
        fills = {}
        for b, spans in by_bin.items():
            spans.sort(key=lambda r: r.start_in_bin)
            pos = 0
            for s in spans:
                assert s.start_in_bin == pos
                pos += s.span_len
            fills[b] = pos
        assert fills == {0: 4, 1: 4, 2: 4, 3: 2}
        # doc 2 (tokens 3..6) straddles windows 0/1: head then tail
        d2 = sorted(
            [r for r in rows if r.id == 2], key=lambda r: r.bin
        )
        assert [(r.bin, r.span_len, r.is_doc_start, r.is_doc_end) for r in d2] == [
            (0, 1, True, False),
            (1, 3, False, True),
        ]

    def test_single_window_doc_is_start_and_end(self, spark):
        from mofka_spark.operators.packing import pack_manifest

        df = spark.createDataFrame([(1, 4)], ["doc_id", "n_tokens"])
        (row,) = pack_manifest(df, capacity=8).collect()
        assert row.is_doc_start and row.is_doc_end
        assert row.span_len == 4 and row.start_in_bin == 0

    def test_zero_token_doc_marker_span(self, spark):
        from mofka_spark.operators.packing import pack_manifest

        df = spark.createDataFrame(
            [(1, 2), (2, 0), (3, 2)], ["doc_id", "n_tokens"]
        )
        rows = {r.id: r for r in pack_manifest(df, capacity=8).collect()}
        assert rows[2].span_len == 0
        assert rows[2].start_in_bin == 2  # sits at its stream position
        # neighbors unaffected
        assert rows[3].start_in_bin == 2 and rows[3].span_len == 2

    def test_consistent_with_pack_sequences(self, spark):
        from mofka_spark.operators.packing import (
            pack_manifest,
            pack_sequences,
        )

        df = spark.createDataFrame(
            [(i, (i * 7) % 11 + 1) for i in range(50)],
            ["doc_id", "n_tokens"],
        )
        pos = {r.id: r for r in pack_sequences(df, capacity=16).collect()}
        man = pack_manifest(df, capacity=16).collect()
        for r in man:
            p = pos[r.id]
            assert p.first_bin <= r.bin <= p.last_bin
        # per-doc span lengths sum to n_tokens
        tot: dict = {}
        for r in man:
            tot[r.id] = tot.get(r.id, 0) + r.span_len
        assert all(tot[i] == pos[i].n_tokens for i in tot)


class TestShardPlan:
    def test_matches_export_layout_contract(self, spark):
        from mofka_spark.operators.packing import shard_plan

        df = spark.createDataFrame(
            [(i,) for i in range(25)], "doc_id long"
        )
        out = shard_plan(df, "doc_id", shard_rows=10).collect()
        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r["epoch_pos"])
        assert sorted(by_shard) == [0, 1, 2]
        assert sorted(by_shard[0]) == list(range(10))
        assert sorted(by_shard[2]) == [20, 21, 22, 23, 24]  # ragged tail

    def test_seeded_plan_is_permutation(self, spark):
        from mofka_spark.operators.packing import shard_plan

        df = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
        out = shard_plan(df, "doc_id", shard_rows=5, seed=3).collect()
        assert sorted(r["epoch_pos"] for r in out) == list(range(12))
        # order differs from the id order for a real shuffle seed
        id_order = [r["id"] for r in sorted(out, key=lambda r: r["epoch_pos"])]
        assert id_order != sorted(id_order)

    def test_bad_shard_rows_rejected(self, spark):
        from mofka_spark.operators.packing import shard_plan
        import pytest as _pytest

        df = spark.createDataFrame([(1,)], "doc_id long")
        with _pytest.raises(ValueError):
            shard_plan(df, "doc_id", shard_rows=0)


class TestBucketBatches:
    def _naive(self, rows, boundaries=(16, 64, 256), batch_size=8):
        import hashlib

        out = {}
        by_bucket = {}
        for i, n in rows:
            b = sum(1 for x in boundaries if n >= x)
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) % 1000000
            by_bucket.setdefault(b, []).append((h, i, n))
        for b, items in by_bucket.items():
            for rn, (h, i, n) in enumerate(sorted(items)):
                out[i] = (n, b, rn // batch_size)
        return out

    def test_matches_naive_greedy(self, spark):
        from mofka_spark.operators.packing import bucket_batches

        rows = [(i, (i * 37) % 300) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        got = {
            r["id"]: (r["n_tokens"], r["bucket"], r["batch_idx"])
            for r in bucket_batches(df, batch_size=8).collect()
        }
        assert got == self._naive(rows)

    def test_batches_are_full_except_last_per_bucket(self, spark):
        from mofka_spark.operators.packing import bucket_batches

        rows = [(i, 20) for i in range(21)]  # one bucket, 21 docs, bs=8
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = bucket_batches(df, batch_size=8).collect()
        sizes = {}
        for r in out:
            sizes[(r["bucket"], r["batch_idx"])] = (
                sizes.get((r["bucket"], r["batch_idx"]), 0) + 1
            )
        assert sorted(sizes.values()) == [5, 8, 8]

    def test_null_tokens_dropped_and_validation(self, spark):
        from mofka_spark.operators.packing import bucket_batches

        df = spark.createDataFrame(
            [(1, 10), (2, None)], "doc_id long, n_tokens long"
        )
        assert [r["id"] for r in bucket_batches(df).collect()] == [1]
        with pytest.raises(ValueError):
            bucket_batches(df, batch_size=0)
        with pytest.raises(ValueError):
            bucket_batches(df, boundaries=(64, 16))

    def test_no_per_bucket_global_sort_and_gc_bounded(self, spark):
        # the rank must come from the distributed prefix count: every
        # Sort in the plan partition-local, every pinned block a
        # localCheckpoint
        from mofka_spark.operators.packing import bucket_batches

        sc = spark.sparkContext
        before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
        rows = [(i, (i * 7) % 100) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = bucket_batches(df, batch_size=4)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Sort [" in line:
                assert ", false, 0" in line, line
        jmap = sc._jsc.getPersistentRDDs()
        for rid in set(jmap.keySet().toArray()) - before:
            assert jmap.get(rid).rdd().isLocallyCheckpointed()

    def test_deterministic_across_runs(self, spark):
        from mofka_spark.operators.packing import bucket_batches

        rows = [(i, (i * 13) % 200) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        a = sorted(map(tuple, bucket_batches(df).collect()))
        b = sorted(map(tuple, bucket_batches(df).collect()))
        assert a == b


class TestBucketShardExport:
    def _batches(self, spark, n=90):
        from mofka_spark.operators.packing import bucket_batches

        rows = [(i, (i * 37) % 300) for i in range(n)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        return bucket_batches(df, batch_size=8)

    def test_plan_batch_seq_dense_and_bucket_ordered(self, spark):
        from mofka_spark.operators.packing import bucket_shard_plan

        out = bucket_shard_plan(self._batches(spark), 4).collect()
        # batch_seq is dense 0..n_batches-1
        seqs = sorted({r["batch_seq"] for r in out})
        assert seqs == list(range(len(seqs)))
        # (bucket, batch_idx) -> batch_seq is strictly increasing in
        # (bucket asc, batch_idx asc): bucketed curriculum preserved
        keyed = sorted(
            {(r["bucket"], r["batch_idx"], r["batch_seq"]) for r in out}
        )
        assert [k[2] for k in keyed] == list(range(len(keyed)))
        # a batch is atomic: one batch_seq per (bucket, batch_idx)
        assert len(keyed) == len({(k[0], k[1]) for k in keyed})

    def test_batches_never_split_across_shards(self, spark):
        from mofka_spark.operators.packing import bucket_shard_plan

        out = bucket_shard_plan(self._batches(spark), 4).collect()
        shard_of = {}
        for r in out:
            key = (r["bucket"], r["batch_idx"])
            shard_of.setdefault(key, set()).add(r["shard"])
        assert all(len(s) == 1 for s in shard_of.values())
        # exactly batches_per_shard batches per shard (last ragged)
        per_shard = {}
        for (b, bi), s in shard_of.items():
            per_shard[next(iter(s))] = per_shard.get(next(iter(s)), 0) + 1
        shards = sorted(per_shard)
        assert shards == list(range(len(shards)))
        assert all(per_shard[s] == 4 for s in shards[:-1])
        assert 1 <= per_shard[shards[-1]] <= 4

    def test_export_manifest_exact_spans(self, spark, tmp_path):
        from mofka_spark.operators.packing import export_bucket_shards

        path = str(tmp_path / "shards")
        man = {
            r["shard"]: r
            for r in export_bucket_shards(
                self._batches(spark), path, batches_per_shard=4
            ).collect()
        }
        # contiguous non-overlapping [first_seq, last_seq] spans
        prev_last = -1
        for s in sorted(man):
            row = man[s]
            assert row["first_seq"] == prev_last + 1
            assert row["first_seq"] == s * 4
            assert row["n_batches"] == row["last_seq"] - row["first_seq"] + 1
            prev_last = row["last_seq"]
        # written files: concatenation in shard order is batch_seq order
        got = (
            spark.read.parquet(path)
            .orderBy("shard", "batch_seq", "id")
            .collect()
        )
        assert [r["batch_seq"] for r in got] == sorted(
            r["batch_seq"] for r in got
        )
        # row totals survive the round-trip
        assert len(got) == self._batches(spark).count()

    def test_plan_validation_and_empty(self, spark):
        from mofka_spark.operators.packing import bucket_shard_plan

        empty = spark.createDataFrame(
            [], "id long, n_tokens long, bucket int, batch_idx long"
        )
        assert bucket_shard_plan(empty, 4).count() == 0
        with pytest.raises(ValueError):
            bucket_shard_plan(empty, 0)
