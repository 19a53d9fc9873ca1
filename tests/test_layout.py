"""Clustered-write layout: row-group skipping measured from footers."""

from __future__ import annotations

from pyspark.sql import functions as F

from mofka_spark.operators import layout
from mofka_spark.queries import _t

SF = "/root/testdata/sf0.001"


class TestOptimizeLayout:
    def test_range_clustering_enables_skipping(self, spark, tmp_path):
        ev = _t(spark, SF, "events").select("event_id", "user_id", "value")
        shuffled = str(tmp_path / "shuffled")
        clustered = str(tmp_path / "clustered")
        # adversarial baseline: round-robin spread destroys clustering
        ev.repartition(8).write.parquet(shuffled)
        layout.optimize_layout(ev, clustered, ["user_id"], num_files=8)

        lo, hi = 10, 20  # narrow user_id band
        bad = layout.pruning_ratio(shuffled, "user_id", lo, hi)
        good = layout.pruning_ratio(clustered, "user_id", lo, hi)
        # a random layout skips ~nothing; a clustered one skips most rows
        assert bad < 0.2
        assert good > 0.6
        # correctness: the rewrite is a layout change only
        a = spark.read.parquet(clustered).orderBy("event_id").collect()
        b = ev.orderBy("event_id").collect()
        assert a == b

    def test_zorder_serves_both_columns(self, spark, tmp_path):
        # derive both dims from event_id so each spreads over the full
        # 10-bit range (user_id at this SF has ~15 distinct values,
        # which would leave the key's u-side high bits constant);
        # odd multipliers make the two dims decorrelated permutations
        ev = (
            _t(spark, SF, "events")
            .select(
                "event_id",
                ((F.col("event_id") * 7) % 1024).alias("u"),
                ((F.col("event_id") * 13 + 5) % 1024).alias("e"),
            )
        )
        zpath = str(tmp_path / "zorder")
        spath = str(tmp_path / "sorted")
        # dims here are pre-scaled into the full 10-bit range, so this
        # exercises the RAW interleave path (zorder_scale=False); the
        # auto-scale path has its own test below
        layout.optimize_layout(ev, zpath, ["u", "e"], num_files=8, zorder=True,
                               zorder_bits=10, zorder_scale=False)
        layout.optimize_layout(ev, spath, ["u", "e"], num_files=8)

        # lexicographic (u, e) clustering serves u but leaves e
        # unclustered; the z-order layout must skip on BOTH
        z_u = layout.pruning_ratio(zpath, "u", 0, 63)
        z_e = layout.pruning_ratio(zpath, "e", 0, 63)
        s_e = layout.pruning_ratio(spath, "e", 0, 63)
        assert z_u > 0.4
        assert z_e > 0.4
        assert z_e > s_e

    def test_zorder_autoscale_unequal_skewed_dims(self, spark, tmp_path):
        # the realistic case the raw interleave fails on: one wide dim
        # (0..1499) against one narrow skewed dim (value^2 shape) —
        # equi-depth scaling must give BOTH dims usable skipping
        ev = (
            _t(spark, SF, "events")
            .select(
                "event_id",
                ((F.col("event_id") * 7) % 1500).alias("wide"),
                (((F.col("event_id") * 13 + 5) % 100) ** 2 / 100.0).alias(
                    "skewed"
                ),
            )
        )
        zpath = str(tmp_path / "zauto")
        layout.optimize_layout(
            ev, zpath, ["wide", "skewed"], num_files=8, zorder=True,
            zorder_bits=12,
        )
        z_w = layout.pruning_ratio(zpath, "wide", 0, 149)   # 10% slice
        # skewed mass concentrates low: [0, 9] holds ~1/3 of rows
        z_s = layout.pruning_ratio(zpath, "skewed", 0.0, 9.0)
        assert z_w > 0.3
        assert z_s > 0.3
        # layout change only: row set identical
        a = spark.read.parquet(zpath).orderBy("event_id").collect()
        b = ev.orderBy("event_id").collect()
        assert a == b

    def test_zorder_degenerate_columns_survive(self, spark, tmp_path):
        # all-NULL and constant cluster columns carry no signal but
        # must not break the rewrite (NULL: no quantiles at all;
        # constant: a single cut)
        ev = (
            _t(spark, SF, "events")
            .select(
                "event_id",
                F.lit(None).cast("double").alias("allnull"),
                F.lit(5.0).alias("constant"),
            )
        )
        zpath = str(tmp_path / "zdegen")
        layout.optimize_layout(
            ev, zpath, ["allnull", "constant", "event_id"], num_files=4,
            zorder=True,
        )
        assert (
            spark.read.parquet(zpath).count() == ev.count()
        )

    def test_zorder_key_interleave(self, spark):
        df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
        key = df.select(layout.zorder_key(["a", "b"], bits=3).alias("k")).collect()[0].k
        # bit layout (LSB first): a0 b0 a1 b1 a2 b2 = 1,1,0,1,1,0
        assert key == 0b011011
