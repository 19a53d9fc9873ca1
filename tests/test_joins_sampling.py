"""As-of join and deterministic sampling unit tests."""

import datetime

import pytest
from pyspark.sql import functions as F

from mofka_spark.operators.joins import asof_join
from mofka_spark.operators.sampling import hash_sample, stratified_hash_sample


def _ts(s):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [("A", _ts(3), 100), ("A", _ts(10), 101), ("B", _ts(5), 200), ("C", _ts(1), 300)],
        "sym string, ts timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [("A", _ts(1), 9.0), ("A", _ts(3), 10.0), ("A", _ts(7), 11.0), ("B", _ts(9), 20.0)],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


class TestAsofJoin:
    def test_backward_with_equal_match(self, trades_quotes):
        trades, quotes = trades_quotes
        out = asof_join(trades, quotes, on="ts", by=["sym"], value_cols=["px"])
        rows = {r.trade_id: r.px for r in out.collect()}
        # trade A@3 sees quote A@3 (equal time matches), A@10 sees A@7,
        # B@5 has no quote yet, C has no quotes at all
        assert rows == {100: 10.0, 101: 11.0, 200: None, 300: None}

    def test_tolerance(self, trades_quotes):
        trades, quotes = trades_quotes
        out = asof_join(
            trades, quotes, on="ts", by=["sym"], value_cols=["px"], tolerance_sec=2
        )
        rows = {r.trade_id: r.px for r in out.collect()}
        # A@10's latest quote is A@7: 3s ago > tolerance 2 -> null
        assert rows == {100: 10.0, 101: None, 200: None, 300: None}

    def test_matched_time_column(self, trades_quotes):
        trades, quotes = trades_quotes
        out = asof_join(trades, quotes, on="ts", by=["sym"], value_cols=["px"])
        row = {r.trade_id: r for r in out.collect()}[101]
        assert row.ts_matched == _ts(7)

    def test_no_range_explosion_plan(self, trades_quotes, spark):
        from mofka_spark.plans import plan_string

        trades, quotes = trades_quotes
        out = asof_join(trades, quotes, on="ts", by=["sym"], value_cols=["px"])
        plan = plan_string(out)
        # linear formulation: a window over the union, never a join
        assert "Join" not in plan
        assert "Window" in plan

    def test_row_count_preserved(self, trades_quotes):
        trades, quotes = trades_quotes
        out = asof_join(trades, quotes, on="ts", by=["sym"], value_cols=["px"])
        assert out.count() == trades.count()


class TestHashSampling:
    def test_deterministic_and_stable_under_growth(self, spark):
        df1 = spark.range(0, 1000).withColumnRenamed("id", "k")
        df2 = spark.range(0, 2000).withColumnRenamed("id", "k")
        s1 = {r.k for r in hash_sample(df1, "k", 0.2).collect()}
        s2 = {r.k for r in hash_sample(df2, "k", 0.2).collect()}
        # growing the table never flips existing decisions
        assert s1 == {k for k in s2 if k < 1000}
        # repeatable
        assert s1 == {r.k for r in hash_sample(df1, "k", 0.2).collect()}

    def test_fraction_approximate(self, spark):
        df = spark.range(0, 10000).withColumnRenamed("id", "k")
        n = hash_sample(df, "k", 0.3).count()
        assert 0.27 * 10000 < n < 0.33 * 10000

    def test_salt_changes_selection(self, spark):
        df = spark.range(0, 1000).withColumnRenamed("id", "k")
        a = {r.k for r in hash_sample(df, "k", 0.2, salt="a").collect()}
        b = {r.k for r in hash_sample(df, "k", 0.2, salt="b").collect()}
        assert a != b

    def test_stratified(self, spark):
        rows = [(i, "en" if i % 2 else "de") for i in range(2000)]
        df = spark.createDataFrame(rows, "k long, lang string")
        out = stratified_hash_sample(
            df, "k", "lang", {"de": 1.0, "en": 0.1}, default_fraction=0.0
        )
        by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert by_lang["de"] == 1000
        assert 50 < by_lang["en"] < 150

    def test_pushdown(self, spark, sf_dir):
        from mofka_spark.plans import has_pushed_filter, plan_string

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = hash_sample(docs, "doc_id", 0.1)
        assert "Exchange" not in plan_string(out)  # no shuffle: scan+filter


class TestWeightedSample:
    def _docs(self, spark):
        rows = [(i, "g", 1 if i < 90 else 1000) for i in range(100)]
        return spark.createDataFrame(rows, ["doc_id", "lang", "wt"])

    def test_k_per_stratum_and_deterministic(self, spark):
        from mofka_spark.operators import sampling

        df = self._docs(spark)
        a = sampling.weighted_sample(df, "doc_id", "wt", "lang", k=5)
        b = sampling.weighted_sample(df, "doc_id", "wt", "lang", k=5)
        ra, rb = sorted(a.collect()), sorted(b.collect())
        assert len(ra) == 5 and ra == rb

    def test_weight_bias(self, spark):
        # 10 rows carry 1000x the weight of the other 90: they should
        # dominate the sample overwhelmingly
        from mofka_spark.operators import sampling

        out = sampling.weighted_sample(
            self._docs(spark), "doc_id", "wt", "lang", k=5
        ).collect()
        heavy = sum(1 for r in out if r.doc_id >= 90)
        assert heavy >= 4

    def test_salt_changes_draw(self, spark):
        from mofka_spark.operators import sampling

        df = self._docs(spark)
        a = {r.doc_id for r in sampling.weighted_sample(df, "doc_id", "wt", "lang", 5).collect()}
        b = {r.doc_id for r in sampling.weighted_sample(df, "doc_id", "wt", "lang", 5, salt="x").collect()}
        assert a != b


class TestRankBins:
    def test_balanced_and_monotone(self, spark):
        from mofka_spark.operators import sampling

        rows = [(i, "g", i * 7 % 101) for i in range(100)]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "score"])
        out = sampling.rank_bins(df, "score", "lang", "doc_id", n_bins=10).collect()
        by_bin = {}
        for r in out:
            by_bin.setdefault(r.bin, []).append(r.score)
        assert set(by_bin) == set(range(10))
        assert all(len(v) == 10 for v in by_bin.values())
        # bin boundaries are monotone in score
        for b in range(9):
            assert max(by_bin[b]) <= min(by_bin[b + 1])

    def test_strata_independent(self, spark):
        from mofka_spark.operators import sampling

        rows = [(i, "a", i) for i in range(10)] + [(i + 100, "b", i) for i in range(30)]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "score"])
        out = sampling.rank_bins(df, "score", "lang", "doc_id", n_bins=5).collect()
        a_bins = [r.bin for r in out if r.lang == "a"]
        b_bins = [r.bin for r in out if r.lang == "b"]
        assert sorted(set(a_bins)) == list(range(5))
        assert a_bins.count(0) == 2 and b_bins.count(0) == 6


class TestSkewReport:
    def test_counts_share_and_factor(self, spark):
        from mofka_spark.operators import joins

        rows = [("hot",)] * 80 + [("a",)] * 10 + [("b",)] * 10
        df = spark.createDataFrame(rows, ["k"])
        out = {r.k: r for r in joins.skew_report(df, "k").collect()}
        assert out["hot"].n_rows == 80
        assert out["hot"].share == 0.8
        # 3 keys, mean ~33.3 rows/key: straggler factor 80/33.3 = 2.4
        assert abs(out["hot"].straggler_factor - 2.4) < 1e-9
        assert out["a"].straggler_factor == 0.3

    def test_top_k_and_tiebreak(self, spark):
        from mofka_spark.operators import joins

        rows = [(c,) for c in "abcde" for _ in range(3)]
        df = spark.createDataFrame(rows, ["k"])
        out = joins.skew_report(df, "k", top_k=2).collect()
        assert [r.k for r in out] == ["a", "b"]  # equal counts: key order


class TestFuzzyJoin:
    def test_matches_within_distance(self, spark):
        from mofka_spark.operators import joins

        left = spark.createDataFrame(
            [("red widgett",), ("blu bolt",), ("nothing close",)], ["a"]
        )
        right = spark.createDataFrame(
            [("red widget",), ("blue bolt",), ("hot gear",)], ["b"]
        )
        out = joins.fuzzy_join_pairs(left, right, "a", "b", max_dist=2)
        got = {(r.left_val, r.right_val): r.dist for r in out.collect()}
        assert got[("red widgett", "red widget")] == 1
        assert got[("blu bolt", "blue bolt")] == 1
        assert all(k[0] != "nothing close" for k in got)

    def test_equals_naive_cross_join(self, spark):
        # the blocking must be complete: result == brute force
        from mofka_spark.operators import joins

        vals = ["abcdef", "abcdxf", "zzzzzz", "abcde", "qwerty", "qwarty"]
        left = spark.createDataFrame([(v,) for v in vals], ["a"])
        right = spark.createDataFrame([(v,) for v in vals], ["b"])
        out = {
            (r.left_val, r.right_val)
            for r in joins.fuzzy_join_pairs(left, right, "a", "b", 2).collect()
        }
        brute = {
            (r.a, r.b)
            for r in left.crossJoin(right)
            .filter(F.levenshtein("a", "b") <= 2)
            .collect()
        }
        assert out == brute

    def test_short_string_fallback(self, spark):
        # strings below the pigeonhole bound still match exactly
        from mofka_spark.operators import joins

        left = spark.createDataFrame([("ab",), ("abcdefgh",)], ["a"])
        right = spark.createDataFrame([("ac",), ("abcdefgx",)], ["b"])
        out = {
            (r.left_val, r.right_val)
            for r in joins.fuzzy_join_pairs(left, right, "a", "b", 1).collect()
        }
        assert ("ab", "ac") in out
        assert ("abcdefgh", "abcdefgx") in out

    def test_no_nested_loop_in_plan(self, spark):
        # every candidate path is a hash equi-join: gram blocking for
        # long strings, length-band join for short — never a
        # cartesian/broadcast-nested-loop
        from mofka_spark import plans
        from mofka_spark.operators import joins

        left = spark.createDataFrame([("abc",), ("abcdefgh",)], ["a"])
        right = spark.createDataFrame([("abd",), ("abcdefgx",)], ["b"])
        p = plans.plan_string(joins.fuzzy_join_pairs(left, right, "a", "b", 2))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


class TestTemperatureMix:
    def _docs(self, spark):
        rows = [(i, "head" if i < 90 else "tail") for i in range(100)]
        return spark.createDataFrame(rows, ["doc_id", "lang"])

    def test_tail_upsampled_head_downsampled(self, spark):
        from mofka_spark.operators.sampling import temperature_mix

        df = self._docs(spark)
        _, rates = temperature_mix(df, "doc_id", "lang", target_rows=50)
        # alpha=0.5: head weight sqrt(90), tail sqrt(10) -> the tail's
        # RATE must exceed the head's (upsampling), natural share is 9:1
        assert rates["tail"] > rates["head"]
        # and budget shares follow sqrt proportions, not counts
        import math

        w = math.sqrt(90) + math.sqrt(10)
        assert abs(rates["head"] - 50 * math.sqrt(90) / w / 90) < 1e-12

    def test_alpha_one_is_natural_proportion(self, spark):
        from mofka_spark.operators.sampling import temperature_mix

        df = self._docs(spark)
        _, rates = temperature_mix(df, "doc_id", "lang", target_rows=50, alpha=1.0)
        assert abs(rates["head"] - 0.5) < 1e-12
        assert abs(rates["tail"] - 0.5) < 1e-12

    def test_rate_capped_at_one_and_deterministic(self, spark):
        from mofka_spark.operators.sampling import temperature_mix

        df = self._docs(spark)
        s1, rates = temperature_mix(df, "doc_id", "lang", target_rows=500, alpha=0.0)
        # alpha=0 splits budget evenly; the 10-row tail caps at rate 1
        assert rates["tail"] == 1.0
        s2, _ = temperature_mix(df, "doc_id", "lang", target_rows=500, alpha=0.0)
        assert sorted(r.doc_id for r in s1.collect()) == sorted(
            r.doc_id for r in s2.collect()
        )


class TestSplitAssign:
    def test_deterministic_and_partitioned(self, spark):
        from mofka_spark.operators.sampling import split_assign

        df = spark.createDataFrame([(i,) for i in range(2000)], ["doc_id"])
        out = split_assign(df, "doc_id").groupBy("split").count().collect()
        shares = {r.split: r["count"] / 2000 for r in out}
        assert set(shares) == {"train", "val", "test"}
        assert abs(shares["train"] - 0.8) < 0.05
        assert abs(shares["val"] - 0.1) < 0.03
        # append-stability: the same keys keep their split in a superset
        small = {
            r.doc_id: r.split
            for r in split_assign(
                spark.createDataFrame([(i,) for i in range(100)], ["doc_id"]),
                "doc_id",
            ).collect()
        }
        big = {
            r.doc_id: r.split
            for r in split_assign(df, "doc_id").collect()
        }
        assert all(big[k] == v for k, v in small.items())

    def test_holdout_remainder_is_null(self, spark):
        from mofka_spark.operators.sampling import split_assign

        df = spark.createDataFrame([(i,) for i in range(500)], ["doc_id"])
        out = split_assign(df, "doc_id", fractions={"train": 0.5}).collect()
        splits = {r.split for r in out}
        assert splits == {"train", None}

    def test_full_fractions_cover_every_bucket(self, spark):
        """Three 1/3 shares truncate to 333333 each; the last stratum
        must absorb the trailing hash buckets so fractions summing to
        1.0 never leave a NULL split."""
        from mofka_spark.operators.sampling import _MOD, hash_bucket, split_assign

        df = spark.createDataFrame([(i,) for i in range(3000)], ["doc_id"])
        thirds = {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}
        out = split_assign(df, "doc_id", fractions=thirds)
        assert out.filter(F.col("split").isNull()).count() == 0
        # and specifically a key hashing into the last bucket gets 'c':
        # synthesize one row per residue near the top of the range
        probe = spark.createDataFrame(
            [(f"k{i}",) for i in range(200_000)], ["doc_id"]
        ).withColumn("b", hash_bucket(F.col("doc_id"), "split"))
        top = probe.filter(F.col("b") >= _MOD - 5)
        if top.count():
            got = {
                r.split
                for r in split_assign(top, "doc_id", fractions=thirds).collect()
            }
            assert got == {"c"}


class TestDSIR:
    def _docs(self, spark):
        rows = [
            # target-looking docs: English function words
            (1, "the cat sat on the mat and the dog sat too", "en"),
            (2, "the quick brown fox jumps over the lazy dog", "en"),
            (3, "a cat and a dog and a fox sat on a mat", "en"),
            # off-target docs: disjoint vocabulary
            (4, "zzz qqq www eee rrr ttt yyy uuu iii ooo", "xx"),
            (5, "aaa bbb ccc ddd fff ggg hhh jjj kkk lll", "xx"),
            (6, "the cat sat qqq www eee on the mat", "mix"),
        ]
        return spark.createDataFrame(rows, ["doc_id", "text", "lang"])

    def test_target_docs_score_higher(self, spark):
        from mofka_spark.operators.sampling import dsir_weights

        docs = self._docs(spark)
        target = docs.filter(F.col("lang") == "en")
        w = {r.id: r.logw for r in dsir_weights(docs, target).collect()}
        assert len(w) == 6
        # every on-target doc outranks every off-target doc
        assert min(w[1], w[2], w[3]) > max(w[4], w[5])
        # the mixed doc lands between the pure groups
        assert w[6] > max(w[4], w[5])

    def test_deterministic_across_runs(self, spark):
        from mofka_spark.operators.sampling import dsir_weights

        docs = self._docs(spark)
        target = docs.filter(F.col("lang") == "en")
        a = sorted(map(tuple, dsir_weights(docs, target).collect()))
        b = sorted(map(tuple, dsir_weights(docs, target).collect()))
        assert a == b

    def test_select_is_subset_and_biased(self, spark):
        from mofka_spark.operators.sampling import dsir_select, dsir_weights

        docs = self._docs(spark)
        target = docs.filter(F.col("lang") == "en")
        w = dsir_weights(docs, target)
        top = dsir_select(w, 3).collect()
        assert len(top) == 3
        ids = {r.id for r in top}
        assert ids <= {r.id for r in w.collect()}
        # Gumbel noise spans ~[-2, 5]; amplify separation so selection
        # must follow the weights: scale logw by 100
        amplified = w.withColumn("logw", F.col("logw") * 100)
        ids_amp = {r.id for r in dsir_select(amplified, 3).collect()}
        assert ids_amp == {1, 2, 3}

    def test_select_plan_is_take_ordered(self, spark):
        from mofka_spark.operators.sampling import dsir_select, dsir_weights

        docs = self._docs(spark)
        w = dsir_weights(docs, docs.filter(F.col("lang") == "en"))
        plan = dsir_select(w, 3)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        # global Sort must NOT appear (that would be a full-sort top-k)
        assert "Sort [" not in plan.split("TakeOrderedAndProject")[0]

    def test_weights_plan_broadcasts_bucket_tables(self, spark):
        from mofka_spark.operators.sampling import dsir_weights

        docs = self._docs(spark)
        plan = (
            dsir_weights(docs, docs.filter(F.col("lang") == "en"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


class TestCellBalancedSample:
    def test_cap_binds_only_on_dense_cells(self, spark):
        from mofka_spark.operators.sampling import cell_balanced_sample

        # two well-separated directions; 10 docs near +x, 2 near +y
        rows = [(i, [1.0, 0.01 * i]) for i in range(10)]
        rows += [(100, [0.0, 1.0]), (101, [0.01, 1.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = [[1.0, 0.0], [0.0, 1.0]]
        out = cell_balanced_sample(df, cents, cap=3)
        counts = {
            r.cell: r.n
            for r in out.groupBy("cell").agg(F.count("*").alias("n")).collect()
        }
        assert counts[0] == 3      # dense cell capped
        assert counts[1] == 2      # sparse cell survives whole

    def test_deterministic(self, spark):
        from mofka_spark.operators.sampling import cell_balanced_sample

        df = spark.createDataFrame(
            [(i, [1.0, float(i % 5)]) for i in range(30)],
            "vec_id long, embedding array<double>",
        )
        cents = [[1.0, 0.0], [0.0, 1.0]]
        a = sorted(map(tuple, cell_balanced_sample(df, cents, 5).collect()))
        b = sorted(map(tuple, cell_balanced_sample(df, cents, 5).collect()))
        assert a == b


class TestInterleaveStrata:
    def test_low_discrepancy_schedule(self, spark):
        from mofka_spark.operators.sampling import interleave_strata

        rows = [(i, "big") for i in range(90)] + [(1000 + i, "small") for i in range(10)]
        df = spark.createDataFrame(rows, ["doc_id", "stratum"])
        out = interleave_strata(df, "doc_id", "stratum").collect()
        ordered = sorted(out, key=lambda r: (r.interleave_key, r.stratum, r.doc_id))
        # the small stratum (10%) appears ~every 10th position: check
        # gaps between consecutive small rows are tight around 10
        pos = [i for i, r in enumerate(ordered) if r.stratum == "small"]
        gaps = [b - a for a, b in zip(pos, pos[1:])]
        assert gaps and all(8 <= g <= 12 for g in gaps)

    def test_keys_in_unit_interval_and_deterministic(self, spark):
        from mofka_spark.operators.sampling import interleave_strata

        df = spark.createDataFrame(
            [(i, "s%d" % (i % 3)) for i in range(60)], ["doc_id", "stratum"]
        )
        out = interleave_strata(df, "doc_id", "stratum").collect()
        assert all(0.0 < r.interleave_key < 1.0 for r in out)
        again = interleave_strata(df, "doc_id", "stratum").collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))


class TestClusterSafeSplit:
    def test_cluster_members_share_split(self, spark):
        from mofka_spark.operators.sampling import cluster_safe_split

        comp = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)],
            ["id", "keeper_id"],
        )
        out = cluster_safe_split(comp).collect()
        by_keeper = {}
        for r in out:
            by_keeper.setdefault(r.keeper_id, set()).add(r.split)
        assert all(len(s) == 1 for s in by_keeper.values())

    def test_matches_split_assign_on_keeper(self, spark):
        from mofka_spark.operators.sampling import (
            cluster_safe_split,
            split_assign,
        )

        comp = spark.createDataFrame(
            [(i, i // 3 * 3) for i in range(60)], ["id", "keeper_id"]
        )
        a = {r.id: r.split for r in cluster_safe_split(comp).collect()}
        b = {
            r.keeper_id: r.split
            for r in split_assign(
                comp.select("keeper_id").distinct(), "keeper_id"
            ).collect()
        }
        assert all(a[i] == b[i // 3 * 3] for i in range(60))


class TestTemperatureShares:
    def _frame(self, spark):
        rows = (
            [("en",)] * 80 + [("de",)] * 15 + [("zh",)] * 5
        )
        return spark.createDataFrame(rows, "lang string")

    def test_t1_reproduces_natural_proportions(self, spark):
        from mofka_spark.operators.sampling import temperature_shares

        out = {r["stratum"]: r for r in
               temperature_shares(self._frame(spark), "lang", 1.0).collect()}
        assert out["en"]["share"] == pytest.approx(0.8, abs=1e-6)
        assert out["zh"]["natural_share"] == pytest.approx(0.05, abs=1e-6)

    def test_high_t_flattens_low_t_sharpens(self, spark):
        from mofka_spark.operators.sampling import temperature_shares

        df = self._frame(spark)
        hot = {r["stratum"]: r["share"] for r in
               temperature_shares(df, "lang", 100.0).collect()}
        cold = {r["stratum"]: r["share"] for r in
               temperature_shares(df, "lang", 0.5).collect()}
        # T -> inf: near uniform (1/3 each); T < 1: head grows
        assert abs(hot["zh"] - 1 / 3) < 0.02
        assert cold["en"] > 0.8 and cold["zh"] < 0.05

    def test_composes_with_mixture_plan(self, spark):
        from mofka_spark.operators.sampling import (
            mixture_plan, temperature_shares,
        )

        df = self._frame(spark)
        shares = {r["stratum"]: r["share"] for r in
                  temperature_shares(df, "lang", 2.0).collect()}
        plan = mixture_plan(df, "lang", shares, budget=1000)
        got = {r["stratum"]: r for r in plan.collect()}
        # every stratum planned; desired = share * budget
        for s, t in shares.items():
            assert got[s]["desired"] == pytest.approx(
                round(t * 1000, 4), abs=1e-6
            )

    def test_invalid_temperature_rejected(self, spark):
        from mofka_spark.operators.sampling import temperature_shares

        with pytest.raises(ValueError):
            temperature_shares(self._frame(spark), "lang", 0.0)

    def test_nonpositive_weight_stratum_dropped_not_poisoning(self, spark):
        # a stratum whose weight sum is <= 0 used to make ln() NULL and
        # NULL-poison EVERY stratum's share through the shared _denom
        from mofka_spark.operators.sampling import temperature_shares

        df = spark.createDataFrame(
            [("en", 8.0), ("en", 2.0), ("de", 5.0), ("zz", 0.0),
             ("neg", -3.0)],
            "lang string, w double",
        )
        out = {r["stratum"]: r for r in
               temperature_shares(df, "lang", 1.0, weight_col="w").collect()}
        assert set(out) == {"en", "de"}
        assert out["en"]["share"] == pytest.approx(10 / 15, abs=1e-6)
        assert out["de"]["share"] == pytest.approx(5 / 15, abs=1e-6)
        assert all(r["share"] is not None for r in out.values())


class TestMixturePlan:
    def test_arithmetic_and_cap(self, spark):
        from mofka_spark.operators.sampling import mixture_plan

        rows = [("a", i) for i in range(100)] + [("b", i) for i in range(10)]
        df = spark.createDataFrame(rows, ["s", "id"])
        out = {r.stratum: r for r in mixture_plan(
            df, "s", {"a": 0.5, "b": 0.5}, budget=200, max_repeat=4.0
        ).collect()}
        # a: 100 desired over 100 available -> repeat 1.0, uncapped
        assert out["a"].repeat_factor == 1.0 and not out["a"].capped
        assert out["a"].realized == 100.0
        # b: 100 desired over 10 available -> wants 10x, capped at 4
        assert out["b"].repeat_factor == 4.0 and out["b"].capped
        assert out["b"].realized == 40.0

    def test_untargeted_strata_omitted(self, spark):
        from mofka_spark.operators.sampling import mixture_plan

        df = spark.createDataFrame(
            [("a", 1), ("c", 2)], ["s", "id"]
        )
        out = mixture_plan(df, "s", {"a": 1.0}, budget=10).collect()
        assert {r.stratum for r in out} == {"a"}

    def test_weight_col_token_budgeting(self, spark):
        from mofka_spark.operators.sampling import mixture_plan

        df = spark.createDataFrame(
            [("a", 1, 70), ("a", 2, 30), ("b", 3, 50)], ["s", "id", "tok"]
        )
        out = {r.stratum: r for r in mixture_plan(
            df, "s", {"a": 0.5, "b": 0.5}, budget=400, weight_col="tok"
        ).collect()}
        assert out["a"].available == 100.0 and out["a"].repeat_factor == 2.0
        assert out["b"].available == 50.0 and out["b"].repeat_factor == 4.0


class TestMixtureExpand:
    def test_integer_rates_exact_copies(self, spark):
        from mofka_spark.operators.sampling import mixture_expand

        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], ["id", "s"]
        )
        out = mixture_expand(df, "id", "s", {"a": 3.0, "b": 1.0}).collect()
        per = {}
        for r in out:
            per.setdefault(r.id, []).append(r.copy)
        assert sorted(per[1]) == [1, 2, 3] and sorted(per[2]) == [1, 2, 3]
        assert per[3] == [1]

    def test_fractional_rate_hits_expected_mass(self, spark):
        from mofka_spark.operators.sampling import mixture_expand

        df = spark.createDataFrame([(i, "a") for i in range(2000)], ["id", "s"])
        n = mixture_expand(df, "id", "s", {"a": 1.5}).count()
        assert abs(n - 3000) / 3000 < 0.05  # 2000 full + ~1000 fractional

    def test_zero_rate_drops_and_unlisted_drops(self, spark):
        from mofka_spark.operators.sampling import mixture_expand

        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], ["id", "s"]
        )
        out = mixture_expand(df, "id", "s", {"a": 0.0, "b": 2.0}).collect()
        assert {r.id for r in out} == {2}

    def test_deterministic_and_scan_local(self, spark):
        from mofka_spark import plans
        from mofka_spark.operators.sampling import mixture_expand

        df = spark.createDataFrame([(i, "a") for i in range(50)], ["id", "s"])
        a = sorted(map(tuple, mixture_expand(df, "id", "s", {"a": 1.7}).collect()))
        b = sorted(map(tuple, mixture_expand(df, "id", "s", {"a": 1.7}).collect()))
        assert a == b
        p = plans.plan_string(mixture_expand(df, "id", "s", {"a": 1.7}))
        assert "Exchange" not in p and "Join" not in p

    def test_negative_rate_rejected(self, spark):
        import pytest

        from mofka_spark.operators.sampling import mixture_expand

        df = spark.createDataFrame([(1, "a")], ["id", "s"])
        with pytest.raises(ValueError, match="negative rate"):
            mixture_expand(df, "id", "s", {"a": -1.0})


class TestCurriculumSelect:
    """curriculum_select: greedy token-budget fill via the binned
    threshold path, checked against the literal sequential greedy."""

    def _frame(self, spark, rows):
        return spark.createDataFrame(rows, "id long, score double, w long")

    def _greedy(self, rows, budget):
        taken, acc = [], 0
        for rid, score, w in sorted(rows, key=lambda r: (-r[1], r[0])):
            if acc >= budget:
                break
            taken.append(rid)
            acc += w
        return sorted(taken)

    def test_matches_sequential_greedy(self, spark):
        from mofka_spark.operators.sampling import curriculum_select

        rows = [(i, float((i * 37) % 101), (i % 7) + 1) for i in range(200)]
        for budget in (1, 50, 173, 10_000):
            got = sorted(
                r["id"]
                for r in curriculum_select(
                    self._frame(spark, rows), "score", "w", "id", budget,
                    n_bins=8,
                ).collect()
            )
            assert got == self._greedy(rows, budget), budget

    def test_crossing_row_included_once(self, spark):
        from mofka_spark.operators.sampling import curriculum_select

        rows = [(1, 3.0, 10), (2, 2.0, 10), (3, 1.0, 10)]
        out = curriculum_select(
            self._frame(spark, rows), "score", "w", "id", budget=15
        ).collect()
        # budget crossed inside row 2: rows 1 and 2 kept, row 3 not.
        assert sorted(r["id"] for r in out) == [1, 2]

    def test_constant_score_corpus_distributed_greedy(self, spark):
        # min == max drops the whole corpus into one bin (unscored
        # corpora defaulting to a constant are a real input). The
        # partial-bin prefix sum must stay distributed (no global
        # single-partition Sort in the plan) and still match the
        # literal key-asc greedy exactly.
        from mofka_spark.operators.sampling import curriculum_select

        rows = [(i, 1.0, (i % 5) + 1) for i in range(500)]
        # exact_bin_rows=100 forces the distributed path on this small
        # frame (production default only trips it at 1M-row bins)
        out = curriculum_select(
            self._frame(spark, rows), "score", "w", "id", budget=700,
            exact_bin_rows=100,
        )
        assert sorted(r["id"] for r in out.collect()) == self._greedy(
            rows, 700
        )
        # plan evidence: every Sort node is partition-local (the
        # executed-plan string is "Sort [cols], <global>, 0" — a
        # global sort would print ", true, 0")
        plan = out._jdf.queryExecution().executedPlan().toString()
        sorts = [l for l in plan.splitlines() if "Sort [" in l]
        assert sorts, "expected a partition-local Sort for the window"
        for line in sorts:
            assert ", false, 0" in line, line
        # and the small-bin exact path returns the identical selection
        small = curriculum_select(
            self._frame(spark, rows), "score", "w", "id", budget=700
        )
        assert sorted(r["id"] for r in small.collect()) == self._greedy(
            rows, 700
        )

    def test_budget_exceeds_corpus_selects_all(self, spark):
        from mofka_spark.operators.sampling import curriculum_select

        rows = [(1, 3.0, 10), (2, 2.0, 10)]
        out = curriculum_select(
            self._frame(spark, rows), "score", "w", "id", budget=10_000
        )
        assert out.count() == 2

    def test_zero_budget_and_empty_frame(self, spark):
        from mofka_spark.operators.sampling import curriculum_select

        rows = [(1, 3.0, 10)]
        assert (
            curriculum_select(
                self._frame(spark, rows), "score", "w", "id", budget=0
            ).count()
            == 0
        )
        assert (
            curriculum_select(
                self._frame(spark, []), "score", "w", "id", budget=5
            ).count()
            == 0
        )

    def test_null_score_or_weight_excluded(self, spark):
        from mofka_spark.operators.sampling import curriculum_select

        df = spark.createDataFrame(
            [(1, 9.0, 5), (2, None, 5), (3, 8.0, None), (4, 7.0, 5)],
            "id long, score double, w long",
        )
        out = curriculum_select(df, "score", "w", "id", budget=100)
        assert sorted(r["id"] for r in out.collect()) == [1, 4]

    def test_degenerate_constant_score_ties_on_key(self, spark):
        from mofka_spark.operators.sampling import curriculum_select

        rows = [(i, 1.0, 10) for i in range(10)]
        out = curriculum_select(
            self._frame(spark, rows), "score", "w", "id", budget=25
        ).collect()
        # min==max range: single-bin path; ties resolve key-asc.
        assert sorted(r["id"] for r in out) == [0, 1, 2]

    def test_distributed_path_leaves_no_unbounded_persist(self, spark):
        # the distributed prefix-sum path must not leak a bare
        # persist(): any block it pins must be a GC-bounded
        # localCheckpoint (reclaimed when the frame is collected), so
        # repeated degenerate-bin calls in a long-lived session don't
        # accumulate cached blocks until memory pressure evicts them
        from mofka_spark.operators.sampling import curriculum_select

        sc = spark.sparkContext
        before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
        rows = [(i, 1.0, (i % 5) + 1) for i in range(500)]
        out = curriculum_select(
            self._frame(spark, rows), "score", "w", "id", budget=700,
            exact_bin_rows=100,
        )
        out.collect()
        jmap = sc._jsc.getPersistentRDDs()
        for rid in set(jmap.keySet().toArray()) - before:
            jrdd = jmap.get(rid)
            assert jrdd.rdd().isLocallyCheckpointed(), (
                f"RDD {rid} pinned by a bare persist(), not a "
                "GC-bounded localCheckpoint"
            )


class TestGroupTokenCap:
    def test_budget_enforced_per_group_with_one_row_overshoot(self, spark):
        from mofka_spark.operators.sampling import group_token_cap

        rows = [(i, "a", 40) for i in range(10)] + [(100, "b", 5)]
        df = spark.createDataFrame(rows, "id long, g string, w long")
        out = group_token_cap(df, "id", "g", "w", cap=100).collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r["g"], []).append(r["w"])
        # group a: rows taken until 100 tokens crossed -> 3 rows (120)
        assert sum(by_g["a"]) == 120 and len(by_g["a"]) == 3
        # group b under budget: everything kept
        assert by_g["b"] == [5]

    def test_deterministic_selection(self, spark):
        from mofka_spark.operators.sampling import group_token_cap

        rows = [(i, "a", 10) for i in range(20)]
        df = spark.createDataFrame(rows, "id long, g string, w long")
        a = sorted(r["id"] for r in
                   group_token_cap(df, "id", "g", "w", 50).collect())
        b = sorted(r["id"] for r in
                   group_token_cap(df, "id", "g", "w", 50).collect())
        assert a == b and len(a) == 5

    def test_null_weight_dropped(self, spark):
        from mofka_spark.operators.sampling import group_token_cap

        df = spark.createDataFrame(
            [(1, "a", 10), (2, "a", None)], "id long, g string, w long"
        )
        out = group_token_cap(df, "id", "g", "w", 100).collect()
        assert [r["id"] for r in out] == [1]
