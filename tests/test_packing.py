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
