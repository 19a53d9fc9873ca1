"""Sketch aggregates (HLL rollup, quantile gate) and BM25 scoring."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mofka_spark.operators import sketch
from mofka_spark.operators.text import bm25_scores
from mofka_spark.queries import _t

SF = "/root/testdata/sf0.001"


def _events(spark):
    return _t(spark, SF, "events")


class TestHllRollup:
    def test_rollup_matches_single_level(self, spark):
        """Unioning fine sketches must give the SAME estimate as one
        coarse sketch — mergeability is the property the 100 TB
        pattern rests on (HLL union is lossless across splits)."""
        ev = _events(spark)
        two_level = sketch.hll_distinct_rollup(
            ev, ["event_type", F.to_date("ts").alias("d")], ["event_type"], "user_id"
        )
        one_level = ev.groupBy("event_type").agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("single")
        )
        rows = {r.event_type: r.approx_distinct for r in two_level.collect()}
        singles = {r.event_type: r.single for r in one_level.collect()}
        assert rows == singles

    def test_gate_true_and_exact(self, spark):
        ev = _events(spark)
        out = sketch.distinct_count_gate(
            ev, ["event_type"], "user_id", F.to_date("ts")
        ).collect()
        exact = {
            r.event_type: r.n
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert len(out) == len(exact)
        for r in out:
            assert r.exact_distinct == exact[r.event_type]
            assert r.sketch_ok


class TestQuantileGate:
    def test_exact_and_gate(self, spark):
        ev = _events(spark)
        out = sketch.quantile_gate(ev, ["event_type"], "value").collect()
        # exact median cross-check for one group, computed driver-side
        vals = sorted(
            r.value
            for r in ev.filter(F.col("event_type") == "click")
            .select("value")
            .collect()
        )
        n = len(vals)
        pos = 0.5 * (n - 1)
        lo, frac = int(math.floor(pos)), pos - math.floor(pos)
        expected = vals[lo] + frac * (vals[lo + 1] - vals[lo]) if frac else vals[lo]
        row = next(r for r in out if r.event_type == "click")
        assert row.p_50 == pytest.approx(expected, abs=1e-6)
        assert all(r.approx_ok for r in out)


class TestBm25:
    def test_hand_computed(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "hash join hash"),
                (2, "merge sort"),
                (3, "scan only here"),
            ],
            "doc_id long, text string",
        )
        out = {r.id: (r.n_terms, r.bm25) for r in bm25_scores(docs, ["hash", "merge"]).collect()}
        # doc 3 matches nothing -> excluded
        assert set(out) == {1, 2}
        k1, b = 1.2, 0.75
        n_docs, avgdl = 3.0, (3 + 2 + 3) / 3.0

        def score(tf, dfreq, dl):
            idf = math.log(1 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
            return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

        assert out[1][0] == 1
        assert out[1][1] == pytest.approx(score(2, 1, 3), abs=1e-6)
        assert out[2][0] == 1
        assert out[2][1] == pytest.approx(score(1, 1, 2), abs=1e-6)

    def test_null_text_dropped(self, spark):
        docs = spark.createDataFrame(
            [(1, None), (2, "hash")], "doc_id long, text string"
        )
        out = bm25_scores(docs, ["hash"]).collect()
        assert [r.id for r in out] == [2]


class TestGroupZscores:
    def test_normalized_moments(self, spark):
        from mofka_spark.operators import sketch

        rows = [("a", float(v)) for v in range(1, 21)] + [("b", 5.0), ("b", 5.0)]
        df = spark.createDataFrame(rows, ["grp", "value"])
        out = sketch.group_zscores(df, "value", "grp").collect()
        a = [r.z for r in out if r.grp == "a"]
        assert abs(sum(a)) < 1e-6
        # stddev_samp-normalized: sum of squares == n-1
        assert abs(sum(z * z for z in a) - (len(a) - 1)) < 1e-3
        # degenerate group (zero variance) emits 0, not null/inf
        assert all(r.z == 0.0 for r in out if r.grp == "b")

    def test_broadcast_no_window(self, spark):
        from mofka_spark import plans
        from mofka_spark.operators import sketch

        df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], ["grp", "value"])
        out = sketch.group_zscores(df, "value", "grp")
        p = plans.plan_string(out)
        assert "Window" not in p
        assert "BroadcastHashJoin" in p or "BroadcastExchange" in p


class TestWeightedQuantiles:
    def test_hand_computed(self, spark):
        from mofka_spark.operators.sketch import weighted_quantiles

        # group a: values 1,2,3 with weights 1,8,1 -> cf 0.1, 0.9, 1.0
        df = spark.createDataFrame(
            [("a", 1.0, 1), ("a", 2.0, 8), ("a", 3.0, 1), ("b", 5.0, 2)],
            ["g", "v", "w"],
        )
        out = {
            (r.g, r.q): r.wq
            for r in weighted_quantiles(df, "g", "v", "w", [0.05, 0.5, 0.95]).collect()
        }
        assert out[("a", 0.05)] == 1.0   # cf(1.0)=0.1 >= 0.05
        assert out[("a", 0.5)] == 2.0
        assert out[("a", 0.95)] == 3.0   # cf(2.0)=0.9 < 0.95
        assert out[("b", 0.5)] == 5.0

    def test_ties_share_cumulative_weight(self, spark):
        from mofka_spark.operators.sketch import weighted_quantiles

        # tied value 2.0 twice: RANGE frame gives both copies cf=0.75,
        # so q=0.6 resolves to the tie value, not past it
        df = spark.createDataFrame(
            [("a", 1.0, 1), ("a", 2.0, 1), ("a", 2.0, 1), ("a", 9.0, 1)],
            ["g", "v", "w"],
        )
        out = {
            r.q: r.wq
            for r in weighted_quantiles(df, "g", "v", "w", [0.6, 0.8]).collect()
        }
        assert out[0.6] == 2.0 and out[0.8] == 9.0

    def test_nonpositive_weights_excluded(self, spark):
        from mofka_spark.operators.sketch import weighted_quantiles

        df = spark.createDataFrame(
            [("a", 1.0, 0), ("a", 2.0, -3), ("a", 3.0, 1)], ["g", "v", "w"]
        )
        out = weighted_quantiles(df, "g", "v", "w", [0.5]).collect()
        assert [(r.g, r.wq) for r in out] == [("a", 3.0)]


class TestWeightedQuantilesFractionalWeights:
    def test_fractional_weights_not_truncated(self, spark):
        from mofka_spark.operators.sketch import weighted_quantiles

        # all weights in (0,1): a long cast would zero them all out
        df = spark.createDataFrame(
            [("g", 1.0, 0.5), ("g", 2.0, 0.25), ("g", 3.0, 0.25)],
            ["grp", "v", "w"],
        )
        out = {r.q: r.wq for r in weighted_quantiles(df, "grp", "v", "w").collect()}
        # cumulative fractions: 1.0 -> 0.5, 2.0 -> 0.75, 3.0 -> 1.0
        assert out[0.5] == 1.0
        assert out[0.75] == 2.0
        assert out[0.9] == 3.0

    def test_mixed_weights_keep_fraction(self, spark):
        from mofka_spark.operators.sketch import weighted_quantiles

        df = spark.createDataFrame(
            [("g", 1.0, 1.7), ("g", 2.0, 0.3)], ["grp", "v", "w"]
        )
        out = {r.q: r.wq for r in weighted_quantiles(df, "grp", "v", "w").collect()}
        # 1.7/2.0 = 0.85 of mass at v=1: p90 must be 2.0 (1.7 would
        # have truncated to 1 -> 1/1.3 fractions, p90 = 1.0... wrong)
        assert out[0.9] == 2.0 and out[0.5] == 1.0


class TestDistinctOverlap:
    def test_exact_overlap_and_sketch_agreement(self, spark):
        from mofka_spark.operators.sketch import distinct_overlap

        rows = (
            [("a", f"u{i}") for i in range(50)]
            + [("b", f"u{i}") for i in range(25, 75)]   # 25 shared with a
            + [("c", f"x{i}") for i in range(10)]       # disjoint
        )
        df = spark.createDataFrame(rows, ["g", "u"])
        out = {(r.group_a, r.group_b): r for r in distinct_overlap(df, "g", "u").collect()}
        assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
        assert out[("a", "b")].exact_overlap == 25
        assert out[("a", "c")].exact_overlap == 0
        assert all(r.sketch_ok for r in out.values())

    def test_duplicate_values_do_not_inflate(self, spark):
        from mofka_spark.operators.sketch import distinct_overlap

        df = spark.createDataFrame(
            [("a", "u1")] * 5 + [("b", "u1")] * 3, ["g", "u"]
        )
        (row,) = distinct_overlap(df, "g", "u").collect()
        assert row.exact_overlap == 1


class TestCountMin:
    def test_never_undercounts_and_exact_without_collisions(self, spark):
        from mofka_spark.operators.sketch import (
            count_min_build,
            count_min_estimate,
        )

        rows = [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 1
        df = spark.createDataFrame(rows, ["k"])
        sk = count_min_build(df, "k", depth=4, width=1024)
        probes = spark.createDataFrame(
            [("a",), ("b",), ("c",), ("absent",)], ["k"]
        )
        est = {
            r.k: r.est
            for r in count_min_estimate(
                sk, probes, "k", depth=4, width=1024
            ).collect()
        }
        # 3 keys in 4x1024 cells: no collisions, estimates are exact
        assert est == {"a": 7, "b": 3, "c": 1, "absent": 0}

    def test_sketch_size_bounded_by_depth_width(self, spark):
        from mofka_spark.operators.sketch import count_min_build

        df = spark.createDataFrame([(f"k{i}",) for i in range(500)], ["k"])
        sk = count_min_build(df, "k", depth=3, width=16)
        assert sk.count() <= 3 * 16
        # every row contributes to every hash row: cell sums per r
        # all equal the input count
        per_row = {
            r.r: r.s
            for r in sk.groupBy("r").agg(F.sum("cnt").alias("s")).collect()
        }
        assert per_row == {0: 500, 1: 500, 2: 500}

    def test_merge_is_cellwise_sum(self, spark):
        from pyspark.sql import functions as SF

        from mofka_spark.operators.sketch import (
            count_min_build,
            count_min_estimate,
        )

        a = spark.createDataFrame([("x",)] * 4 + [("y",)] * 2, ["k"])
        b = spark.createDataFrame([("x",)] * 1 + [("z",)] * 5, ["k"])
        merged = (
            count_min_build(a, "k", depth=4, width=64)
            .unionAll(count_min_build(b, "k", depth=4, width=64))
            .groupBy("r", "c")
            .agg(SF.sum("cnt").alias("cnt"))
        )
        whole = count_min_build(a.unionAll(b), "k", depth=4, width=64)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )
        probes = spark.createDataFrame([("x",), ("y",), ("z",)], ["k"])
        est = {
            r.k: r.est
            for r in count_min_estimate(
                merged, probes, "k", depth=4, width=64
            ).collect()
        }
        assert est["x"] >= 5 and est["y"] >= 2 and est["z"] >= 5

    def test_weight_col_sums_weights(self, spark):
        from mofka_spark.operators.sketch import (
            count_min_build,
            count_min_estimate,
        )

        df = spark.createDataFrame(
            [("a", 10), ("a", 5), ("b", 2)], ["k", "w"]
        )
        sk = count_min_build(df, "k", depth=4, width=256, weight_col="w")
        probes = spark.createDataFrame([("a",), ("b",)], ["k"])
        est = {
            r.k: r.est
            for r in count_min_estimate(
                sk, probes, "k", depth=4, width=256
            ).collect()
        }
        assert est == {"a": 15, "b": 2}

    def test_forced_collision_overestimates(self, spark):
        from mofka_spark.operators.sketch import (
            count_min_build,
            count_min_estimate,
        )

        # width=1 forces every key into the same cell per row: the
        # estimate for any key is the total row count (the documented
        # one-sided degradation, never an undercount)
        df = spark.createDataFrame(
            [("a",)] * 3 + [("b",)] * 2, ["k"]
        )
        sk = count_min_build(df, "k", depth=2, width=1)
        probes = spark.createDataFrame([("a",), ("zzz",)], ["k"])
        est = {
            r.k: r.est
            for r in count_min_estimate(
                sk, probes, "k", depth=2, width=1
            ).collect()
        }
        assert est == {"a": 5, "zzz": 5}

    def test_broadcast_map_only_estimate_plan(self, spark):
        from mofka_spark import plans
        from mofka_spark.operators.sketch import (
            count_min_build,
            count_min_estimate,
        )

        df = spark.createDataFrame([(f"k{i}",) for i in range(100)], ["k"])
        sk = count_min_build(df, "k", depth=4, width=64)
        out = count_min_estimate(sk, df, "k", depth=4, width=64)
        p = plans.plan_string(out)
        # the sketch side broadcasts; the probe side never sort-merges
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p


class TestBottomkDistinct:
    def test_small_groups_exact(self, spark):
        from mofka_spark.operators.sketch import bottomk_distinct

        rows = [("a", f"u{i}") for i in range(10)] + [("b", "x")] * 5
        df = spark.createDataFrame(rows, ["g", "v"])
        out = {r.g: r.est_distinct for r in bottomk_distinct(df, "g", "v", k=64).collect()}
        # below k: the exact count comes back; duplicates don't inflate
        assert out == {"a": 10.0, "b": 1.0}

    def test_estimate_accuracy_above_k(self, spark):
        from mofka_spark.operators.sketch import bottomk_distinct

        rows = [("g", f"val{i}") for i in range(2000)]
        df = spark.createDataFrame(rows, ["g", "v"])
        (row,) = bottomk_distinct(df, "g", "v", k=256).collect()
        assert abs(row.est_distinct - 2000) / 2000 < 0.25

    def test_nulls_excluded(self, spark):
        from mofka_spark.operators.sketch import bottomk_distinct

        df = spark.createDataFrame(
            [("a", "x"), ("a", None), ("a", "y")], ["g", "v"]
        )
        (row,) = bottomk_distinct(df, "g", "v", k=8).collect()
        assert row.est_distinct == 2.0

    def test_shard_merge_equals_whole(self, spark):
        """bottom-k of a union == k smallest of the merged per-shard
        bottom-k sets — the mergeability the estimator rides, asserted
        through the estimate itself."""
        from pyspark.sql import Window

        from mofka_spark.operators.sampling import hash_bucket
        from mofka_spark.operators.sketch import bottomk_distinct

        vals = [f"v{i}" for i in range(500)]
        k = 64
        whole = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
        (want,) = bottomk_distinct(whole, "g", "v", k=k).collect()
        # shard, keep each shard's k smallest u, merge, re-rank, estimate
        mod = 1 << 48
        u = (
            hash_bucket(F.col("v"), "bk", mod=mod).cast("double") + F.lit(1.0)
        ) / F.lit(float(mod))
        parts = []
        for lo, hi in ((0, 200), (200, 500)):
            shard = spark.createDataFrame(
                [("g", v) for v in vals[lo:hi]], ["g", "v"]
            )
            w = Window.partitionBy("g").orderBy("_u")
            parts.append(
                shard.distinct()
                .select("g", u.alias("_u"))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= k)
                .select("g", "_u")
            )
        merged = parts[0].unionAll(parts[1])
        w = Window.partitionBy("g").orderBy("_u")
        ranked = merged.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= k
        )
        (uk,) = (
            ranked.filter(F.col("_rn") == k).select("_u").collect()
        )
        import builtins

        got = builtins.round((k - 1) / uk._u, 4)
        assert got == want.est_distinct
