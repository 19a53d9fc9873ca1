"""Constraint-audit operator tests (operators/quality.py)."""

import pytest
from pyspark.sql import functions as F

from mofka_spark import plans
from mofka_spark.operators import quality


class TestConstraintAudit:
    def _df(self, spark):
        rows = [
            (1, "F", 10.0, "1-URGENT"),
            (2, "O", -5.0, "2-HIGH"),      # range violation
            (2, "X", 20.0, "3-LOW"),       # dup key + bad status
            (None, "F", 30.0, "bad"),      # null key + bad priority
        ]
        return spark.createDataFrame(
            rows, ["k", "status", "price", "prio"]
        )

    def test_rule_counts(self, spark):
        out = dict(
            (r.rule, r.violations)
            for r in quality.audit(
                self._df(spark),
                [
                    quality.not_null("k"),
                    quality.in_range("price", 0, 100),
                    quality.is_in("status", ["F", "O"]),
                    quality.matches("prio", "[0-9]-[A-Z]+"),
                    quality.unique("k"),
                ],
            ).collect()
        )
        assert out["not_null(k)"] == 1
        assert out["in_range(price,0,100)"] == 1
        assert out["is_in(status)"] == 1
        assert out["matches(prio)"] == 1
        assert out["unique(k)"] == 1  # 3 non-null keys, 2 distinct

    def test_no_match_finds_substring(self, spark):
        # the contamination direction: violation when the pattern is
        # FOUND anywhere (unanchored), e.g. control bytes in text
        df = spark.createDataFrame(
            [("clean",), ("has \x01 ctrl",), (None,)], ["t"]
        )
        out = quality.audit(
            df, [quality.no_match("t", "[\\x00-\\x08]")]
        ).collect()
        assert out[0].violations == 1  # NULL not counted

    def test_no_match_streams(self, spark, tmp_path):
        # distributive: composes into the streaming audit monitor
        from mofka_spark.streaming.monitor import audit_sink, read_audit

        rules = [quality.no_match("t", "[\\x00-\\x08]")]
        store = str(tmp_path / "m")
        sink = audit_sink(store, rules)
        sink(spark.createDataFrame([("ok",), ("b\x02ad",)], ["t"]), 0)
        sink(spark.createDataFrame([("w\x03orse",)], ["t"]), 1)
        got = read_audit(spark, store, rules).collect()
        assert got[0].violations == 2

    def test_matches_is_anchored(self, spark):
        df = spark.createDataFrame([("x1-URGENTx",)], ["prio"])
        out = quality.audit(
            df, [quality.matches("prio", "[0-9]-[A-Z]+")]
        ).collect()
        assert out[0].violations == 1  # substring match must NOT pass

    def test_single_scan(self, spark):
        # N rules -> one aggregate over one scan (no union of scans)
        df = self._df(spark)
        out = quality.audit(
            df,
            [quality.not_null("k"), quality.in_range("price", 0, 100),
             quality.unique("k")],
        )
        p = plans.plan_string(out)
        assert p.count("Scan ") <= 2  # base scan (+ possible reuse line)


class TestStreamingAuditMonitor:
    ROWS = [
        (1, 50.0, "click"), (None, 20.0, "view"), (3, 150.0, "view"),
        (4, -1.0, "buy"), (5, 10.0, "click"), (6, None, "view"),
    ]

    def _rules(self):
        return [
            quality.not_null("k"),
            quality.in_range("v", 0, 100),
            quality.is_in("t", ["click", "view"]),
        ]

    def _batch(self, spark, rows):
        return spark.createDataFrame(rows, "k long, v double, t string")

    def test_matches_batch_and_replay(self, spark, tmp_path):
        from mofka_spark.streaming.monitor import audit_sink, read_audit

        store = str(tmp_path / "m")
        sink = audit_sink(store, self._rules())
        sink(self._batch(spark, self.ROWS[:3]), 0)
        sink(self._batch(spark, self.ROWS[3:]), 1)
        sink(self._batch(spark, self.ROWS[3:]), 1)  # replayed epoch
        got = {
            (r.rule, r.violations)
            for r in read_audit(spark, store, self._rules()).collect()
        }
        want = {
            (r.rule, r.violations)
            for r in quality.audit(
                self._batch(spark, self.ROWS), self._rules()
            ).collect()
        }
        assert got == want

    def test_compaction_is_invisible(self, spark, tmp_path):
        from mofka_spark.streaming.monitor import (
            audit_sink, compact_monitor, read_audit,
        )

        store = str(tmp_path / "m")
        sink = audit_sink(store, self._rules())
        sink(self._batch(spark, self.ROWS[:3]), 0)
        sink(self._batch(spark, self.ROWS[3:]), 1)
        before = sorted(
            map(tuple, read_audit(spark, store, self._rules()).collect())
        )
        compact_monitor(spark, store)
        after = sorted(
            map(tuple, read_audit(spark, store, self._rules()).collect())
        )
        assert before == after

    def test_unique_rejected(self, spark, tmp_path):
        import pytest as _pytest

        from mofka_spark.streaming.monitor import audit_sink

        with _pytest.raises(ValueError, match="not distributive"):
            audit_sink(str(tmp_path / "m"), [quality.unique("k")])


class TestProfile:
    def test_counts_and_ratios(self, spark):
        from mofka_spark.operators.quality import profile

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "a"), (None, "b")],
            "k int, v string",
        )
        out = {r.col_name: r for r in profile(df).collect()}
        assert out["k"].n_rows == 4 and out["k"].n_nulls == 1
        assert out["k"].n_distinct == 3
        assert out["v"].n_nulls == 1 and out["v"].n_distinct == 2
        assert out["v"].null_ratio == 0.25

    def test_approx_mode_no_expand(self, spark):
        from mofka_spark import plans
        from mofka_spark.operators.quality import profile

        df = spark.createDataFrame([(1, "a")], "k int, v string")
        exact_plan = plans.plan_string(profile(df, exact_distinct=True))
        approx_plan = plans.plan_string(profile(df, exact_distinct=False))
        assert "Expand" in exact_plan  # N exact distincts replicate rows
        assert "Expand" not in approx_plan  # HLL keeps one replica
        out = {r.col_name: r.n_distinct for r in profile(df, exact_distinct=False).collect()}
        assert out == {"k": 1, "v": 1}


class TestInclusionProfile:
    def test_known_inclusions(self, spark):
        from mofka_spark.operators.quality import inclusion_profile

        a = spark.createDataFrame([(1,), (2,), (3,), (3,)], ["x"])
        b = spark.createDataFrame([(2,), (3,), (4,), (5,)], ["y"])
        out = {
            (r.from_table, r.from_col, r.to_table, r.to_col): (
                r.n_from, r.n_common, r.inclusion
            )
            for r in inclusion_profile(
                {"ta": a, "tb": b}, [("ta", "x"), ("tb", "y")]
            ).collect()
        }
        assert out[("ta", "x", "tb", "y")] == (3, 2, round(2 / 3, 6))
        assert out[("tb", "y", "ta", "x")] == (4, 2, 0.5)

    def test_true_fk_scores_one(self, spark, sf_dir):
        from mofka_spark.operators.quality import inclusion_profile

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        out = {
            (r.from_table, r.to_table): r.inclusion
            for r in inclusion_profile(
                {"orders": orders, "customer": cust},
                [("orders", "o_custkey"), ("customer", "c_custkey")],
            ).collect()
        }
        # every order's customer exists: the true FK direction is 1.0
        assert out[("orders", "customer")] == 1.0


class TestCorpusReport:
    def test_per_source_stats(self, spark):
        from mofka_spark.operators.quality import corpus_report

        docs = spark.createDataFrame(
            [
                (1, "the cat sat", "en", "web"),
                (2, "The  cat   sat", "en", "web"),   # dup after canon
                (3, "totally different", "de", "web"),
                (4, "single doc here!", "en", "books"),
                (5, None, "en", "books"),              # null text excluded
            ],
            ["doc_id", "text", "lang", "source"],
        )
        out = {r.source: r for r in corpus_report(docs).collect()}
        web = out["web"]
        assert web.n_docs == 3 and web.n_unique_content == 2
        assert web.dup_rate == round(1 - 2 / 3, 4)
        assert web.n_langs == 2
        books = out["books"]
        assert books.n_docs == 1 and books.dup_rate == 0.0
        assert books.avg_tokens == 3.0
        assert books.avg_punct_ratio == round(1 / 16, 4)

    def test_single_aggregate_plan(self, spark):
        from mofka_spark import plans
        from mofka_spark.operators.quality import corpus_report

        docs = spark.createDataFrame(
            [(1, "a b", "en", "s")], ["doc_id", "text", "lang", "source"]
        )
        p = plans.plan_string(corpus_report(docs))
        # one scan; the distinct counts expand inside the same agg
        assert p.count("Scan ") <= 1 or p.count("LocalTableScan") <= 2


class TestPsiDrift:
    def test_identical_distributions_stable(self, spark):
        from mofka_spark.operators.quality import psi_drift

        rows = [("a", float(i % 20)) for i in range(400)]
        ref = spark.createDataFrame(rows, ["g", "v"])
        cur = spark.createDataFrame(rows, ["g", "v"])
        (row,) = psi_drift(ref, cur, "v", group_col="g").collect()
        assert row.psi == 0.0 and not row.drifted
        assert row.n_ref == 400 and row.n_cur == 400

    def test_shifted_distribution_flags_drift(self, spark):
        from mofka_spark.operators.quality import psi_drift

        ref = spark.createDataFrame(
            [("a", float(i % 20)) for i in range(400)], ["g", "v"]
        )
        cur = spark.createDataFrame(
            [("a", 100.0 + i % 20) for i in range(400)], ["g", "v"]
        )
        (row,) = psi_drift(ref, cur, "v", group_col="g").collect()
        # all current mass clamps into the reference's top edge bin
        assert row.drifted and row.psi > 1.0

    def test_moderate_shift_between_thresholds(self, spark):
        from mofka_spark.operators.quality import psi_drift

        ref = spark.createDataFrame(
            [("a", float(i % 100)) for i in range(1000)], ["g", "v"]
        )
        # current skews 30% of mass into the top half
        cur_rows = [("a", float(i % 100)) for i in range(700)]
        cur_rows += [("a", 50.0 + i % 50) for i in range(300)]
        cur = spark.createDataFrame(cur_rows, ["g", "v"])
        (row,) = psi_drift(ref, cur, "v", group_col="g").collect()
        assert 0.0 < row.psi < 1.0

    def test_ungrouped_single_row(self, spark):
        from mofka_spark.operators.quality import psi_drift

        ref = spark.createDataFrame([(float(i),) for i in range(50)], ["v"])
        cur = spark.createDataFrame([(float(i),) for i in range(50)], ["v"])
        out = psi_drift(ref, cur, "v").collect()
        assert len(out) == 1 and out[0].g == "_all" and out[0].psi == 0.0

    def test_nulls_excluded_and_constant_ref(self, spark):
        from mofka_spark.operators.quality import psi_drift

        ref = spark.createDataFrame(
            [("a", 5.0), ("a", 5.0), ("a", None)], ["g", "v"]
        )
        cur = spark.createDataFrame([("a", 5.0), ("a", 9.0)], ["g", "v"])
        (row,) = psi_drift(ref, cur, "v", group_col="g").collect()
        # zero-width reference range: everything lands in one bin via
        # the width floor; half the current mass moved -> positive psi
        assert row.n_ref == 2 and row.n_cur == 2
        assert row.psi >= 0.0


class TestPsiVanishedGroup:
    def test_group_absent_from_current_drifts_not_crashes(self, spark):
        """A group present in the reference but with ZERO current rows
        must yield a finite, strongly-drifted PSI — not DIVIDE_BY_ZERO
        (found by the sf0.001 sweep: small snapshots routinely lose a
        whole group)."""
        from mofka_spark.operators.quality import psi_drift

        ref = spark.createDataFrame(
            [("a", float(i)) for i in range(20)]
            + [("gone", float(i)) for i in range(10)],
            "g string, v double",
        )
        cur = spark.createDataFrame(
            [("a", float(i)) for i in range(20)], "g string, v double"
        )
        out = {r["g"]: r for r in
               psi_drift(ref, cur, "v", group_col="g").collect()}
        assert out["a"]["psi"] == 0.0 and not out["a"]["drifted"]
        gone = out["gone"]
        assert gone["n_cur"] == 0 and gone["drifted"]
        import math
        assert math.isfinite(gone["psi"]) and gone["psi"] > 0.2


class TestBlendScores:
    """blend_scores: exact PERCENT_RANK normalization + weighted sum."""

    def test_matches_literal_percent_rank(self, spark):
        from mofka_spark.operators.quality import blend_scores

        rows = [(i, float((i * 7) % 5), float(i % 3)) for i in range(10)]
        df = spark.createDataFrame(rows, "id long, a double, b double")
        out = {
            r["id"]: r
            for r in blend_scores(df, {"a": 1.0, "b": -0.5}, "id").collect()
        }

        def pr(vals, x):
            below = sum(1 for v in vals if v < x)
            return below / (len(vals) - 1)

        av = [r[1] for r in rows]
        bv = [r[2] for r in rows]
        for rid, a, b in rows:
            assert out[rid]["pr_a"] == pytest.approx(pr(av, a), abs=0)
            assert out[rid]["pr_b"] == pytest.approx(pr(bv, b), abs=0)
            want = round(1.0 * pr(av, a) - 0.5 * pr(bv, b), 6) + 0.0
            assert out[rid]["blended"] == pytest.approx(want, abs=1e-12)

    def test_null_or_nan_signal_excludes_row(self, spark):
        from mofka_spark.operators.quality import blend_scores

        df = spark.createDataFrame(
            [(1, 1.0, 1.0), (2, None, 1.0), (3, float("nan"), 2.0),
             (4, 2.0, None), (5, 3.0, 3.0)],
            "id long, a double, b double",
        )
        out = blend_scores(df, {"a": 1.0, "b": 1.0}, "id")
        assert sorted(r["id"] for r in out.collect()) == [1, 5]

    def test_infinite_signal_excludes_row(self, spark):
        # +/-Inf must be excluded like NULL/NaN: the quantizer's
        # pmod(inf, 1.0) is NaN, which would silently collapse
        # infinite signals into one NaN bucket (ADVICE r9)
        from mofka_spark.operators.quality import blend_scores

        df = spark.createDataFrame(
            [(1, 1.0, 1.0), (2, float("inf"), 1.0),
             (3, float("-inf"), 2.0), (4, 2.0, float("inf")),
             (5, 3.0, 3.0)],
            "id long, a double, b double",
        )
        out = blend_scores(df, {"a": 1.0, "b": 1.0}, "id")
        assert sorted(r["id"] for r in out.collect()) == [1, 5]
        # and with quantization off too (consistent contract)
        out2 = blend_scores(df, {"a": 1.0}, "id", signal_round=None)
        assert sorted(r["id"] for r in out2.collect()) == [1, 4, 5]

    def test_ties_share_min_rank(self, spark):
        from mofka_spark.operators.quality import blend_scores

        df = spark.createDataFrame(
            [(1, 1.0), (2, 1.0), (3, 2.0), (4, 3.0)], "id long, a double"
        )
        out = {r["id"]: r["pr_a"] for r in
               blend_scores(df, {"a": 1.0}, "id").collect()}
        assert out[1] == out[2] == 0.0
        assert out[3] == pytest.approx(2 / 3, abs=0)

    def test_distributed_prefix_sum_path_identical(self, spark):
        """Above distinct_threshold the running count switches to the
        range-partitioned prefix sum; both paths must return identical
        rows (high-cardinality continuous signal, with ties)."""
        from mofka_spark.operators.quality import blend_scores

        rows = [
            (i, float((i * 37) % 211) / 7.0, float(i % 4)) for i in range(400)
        ]
        df = spark.createDataFrame(rows, "id long, a double, b double")
        small = blend_scores(df, {"a": 1.0, "b": -0.25}, "id")
        dist = blend_scores(
            df, {"a": 1.0, "b": -0.25}, "id", distinct_threshold=8
        )
        assert sorted(map(tuple, small.collect())) == sorted(
            map(tuple, dist.collect())
        )

    def test_high_cardinality_window_is_partitioned(self, spark):
        """Plan check: with the distributed path engaged, no Window in
        the physical plan runs unpartitioned (the single-partition
        Window warning VERDICT r10 flagged)."""
        from mofka_spark.operators.quality import blend_scores

        df = spark.createDataFrame(
            [(i, float(i) + 0.5) for i in range(200)], "id long, a double"
        )
        out = blend_scores(df, {"a": 1.0}, "id", distinct_threshold=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        for ln in plan.splitlines():
            if "Window [" in ln:
                assert "_pid" in ln, f"unpartitioned Window in plan: {ln}"
        # and the result is still the exact percent rank
        got = {r["id"]: r["pr_a"] for r in out.collect()}
        assert got[0] == 0.0 and got[199] == pytest.approx(199 / 199, abs=0)

    def test_single_row_percent_rank_zero(self, spark):
        from mofka_spark.operators.quality import blend_scores

        df = spark.createDataFrame([(1, 5.0)], "id long, a double")
        row = blend_scores(df, {"a": 1.0}, "id").first()
        assert row["pr_a"] == 0.0 and row["blended"] == 0.0

    def test_empty_signals_rejected(self, spark):
        from mofka_spark.operators.quality import blend_scores

        df = spark.createDataFrame([(1, 5.0)], "id long, a double")
        with pytest.raises(ValueError):
            blend_scores(df, {}, "id")

    def test_continuous_signals_quantized_by_default(self, spark):
        # The distinct-value map must be bounded by construction:
        # floating signals rank on floor(sig * 10^signal_round), so
        # values closer than the resolution share one bucket (and its
        # min rank). signal_round=None restores raw-value ranking.
        from mofka_spark.operators.quality import blend_scores

        df = spark.createDataFrame(
            [(1, 0.1000001), (2, 0.10000011), (3, 0.2), (4, 0.3)],
            "id long, a double",
        )
        out = {r["id"]: r["pr_a"] for r in
               blend_scores(df, {"a": 1.0}, "id").collect()}
        assert out[1] == out[2] == 0.0  # same 1e-6 bucket -> tied
        assert out[3] == pytest.approx(2 / 3, abs=0)
        raw = {r["id"]: r["pr_a"] for r in
               blend_scores(df, {"a": 1.0}, "id",
                            signal_round=None).collect()}
        assert raw[1] == 0.0 and raw[2] == pytest.approx(1 / 3, abs=0)

    def test_integer_signals_not_quantized(self, spark):
        from mofka_spark.operators.quality import blend_scores

        df = spark.createDataFrame(
            [(1, 10), (2, 11), (3, 12)], "id long, a long"
        )
        out = {r["id"]: r["pr_a"] for r in
               blend_scores(df, {"a": 1.0}, "id").collect()}
        assert out == {1: 0.0, 2: 0.5, 3: 1.0}

    def test_large_magnitude_signals_keep_rank_order(self, spark):
        # floor(sig * 10^6) as a LONG overflows for |sig| >~ 9.2e12 and
        # scrambles rank order; the double-domain floor must not.
        # Negatives included: x - pmod(x, 1.0) must floor (not truncate).
        from mofka_spark.operators.quality import blend_scores

        vals = [-2.0e13, -1.5, -0.5, 0.5, 1.0e13, 3.0e13]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, a double"
        )
        out = {r["id"]: r["pr_a"] for r in
               blend_scores(df, {"a": 1.0}, "id").collect()}
        ranks = [out[i] for i in range(len(vals))]
        assert ranks == sorted(ranks) and len(set(ranks)) == len(vals)
        assert ranks[0] == 0.0 and ranks[-1] == 1.0


class TestKAnonymity:
    def test_group_sizes_and_risk_flags(self, spark):
        from mofka_spark.operators.quality import k_anonymity

        df = spark.createDataFrame(
            [("a", 1, 10), ("a", 1, 11), ("a", 1, 12),
             ("b", 2, 10), ("b", 2, 10)],
            "qi1 string, qi2 int, sens int",
        )
        out = {(r["qi1"], r["qi2"]): r for r in
               k_anonymity(df, ["qi1", "qi2"], k=3, sensitive_col="sens")
               .collect()}
        a = out[("a", 1)]
        assert a["group_size"] == 3 and not a["at_risk"]
        assert a["n_sensitive_distinct"] == 3 and a["diverse"]
        b = out[("b", 2)]
        # below k: at risk; one shared sensitive value: not diverse
        assert b["group_size"] == 2 and b["at_risk"]
        assert b["n_sensitive_distinct"] == 1 and not b["diverse"]

    def test_without_sensitive_col(self, spark):
        from mofka_spark.operators.quality import k_anonymity

        df = spark.createDataFrame([("a",)], "qi string")
        row = k_anonymity(df, ["qi"], k=2).first()
        assert row["at_risk"] and "n_sensitive_distinct" not in row.asDict()

    def test_empty_qi_rejected(self, spark):
        from mofka_spark.operators.quality import k_anonymity

        df = spark.createDataFrame([("a",)], "qi string")
        with pytest.raises(ValueError):
            k_anonymity(df, [], k=2)


class TestClassifierScores:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "the cat and the dog went to the park in peace"),
                (2, "buy!!! now!!! click;;; here... cheap,,, deals???"),
                (3, None),
                (4, ""),
            ],
            "doc_id long, text string",
        )

    def test_default_scorer_ranks_prose_over_punct_soup(self, spark):
        from mofka_spark.operators.quality import classifier_scores

        out = {r["id"]: r["score"] for r in
               classifier_scores(self._docs(spark)).collect()}
        assert set(out) == {1, 2, 4}  # NULL text dropped, empty kept
        assert out[1] > out[2]

    def test_default_scorer_arithmetic(self, spark):
        # doc 1: 11 tokens, 6 stopword hits (the x3, and, to, in),
        # 0 punct -> (2*6+1)/(11+3) - 0 = 13/14
        from mofka_spark.operators.quality import classifier_scores

        row = {r["id"]: r["score"] for r in
               classifier_scores(self._docs(spark)).collect()}
        assert row[1] == pytest.approx(13.0 / 14.0, abs=1e-12)
        # empty text: 0 tokens -> 1/3 exactly
        assert row[4] == pytest.approx(1.0 / 3.0, abs=1e-12)

    def test_default_scorer_ascii_whitespace_only(self, spark):
        # Unicode whitespace (U+00A0, U+2028) must count as TOKEN
        # CHARS, matching the Java-regex tokenizer and the RE2
        # oracle, not Python's Unicode-aware \s (ADVICE r9)
        import pandas as pd

        from mofka_spark.operators.quality import default_text_scorer

        s = default_text_scorer(
            pd.Series(["the\u00a0cat", "the cat", "in\u2028peace"])
        )
        # "the cat": ONE token (nbsp is not a separator), no
        # exact stopword hit -> (2*0+1)/(1+3) - 0/(7+10)
        assert s[0] == pytest.approx(1.0 / 4.0, abs=1e-12)
        # "the cat": two tokens, one stopword
        assert s[1] == pytest.approx(3.0 / 5.0, abs=1e-12)
        assert s[2] == pytest.approx(1.0 / 4.0, abs=1e-12)

    def test_custom_scorer_hook(self, spark):
        from mofka_spark.operators.quality import classifier_scores

        def scorer(texts):
            return texts.str.len().astype("float64")

        out = {r["id"]: r["score"] for r in
               classifier_scores(self._docs(spark), scorer=scorer).collect()}
        assert out[4] == 0.0 and out[1] == 45.0

    def test_keep_cols_and_filter(self, spark):
        from mofka_spark.operators.quality import (
            classifier_filter, classifier_scores,
        )

        scored = classifier_scores(self._docs(spark), keep_cols=True)
        assert scored.columns == ["doc_id", "text", "score"]
        kept = classifier_filter(self._docs(spark), threshold=0.5)
        assert [r["doc_id"] for r in kept.collect()] == [1]
        assert "text" in kept.columns  # the document rides through

    def test_real_model_scorer_loads_once_per_worker(
        self, spark, tmp_path
    ):
        # the production injection pattern, executable: a serialized
        # hashed-feature logistic regression loads lazily inside each
        # worker and is cached — loads recorded == DISTINCT worker
        # pids, never once per task/batch/row
        import numpy as np

        from mofka_spark.operators.quality import (
            classifier_scores,
            hashed_logistic_scorer,
        )

        n = 64
        rng = np.random.default_rng(7)
        model = str(tmp_path / "lr.npz")
        np.savez(model, w=rng.normal(size=n), b=np.float64(0.25))
        docs = spark.createDataFrame(
            [(i, f"doc number {i} with words w{i % 5}") for i in range(64)],
            "doc_id long, text string",
        ).repartition(16)  # many tasks, few workers
        scorer = hashed_logistic_scorer(model, record_loads=True)
        out = classifier_scores(docs, scorer=scorer).collect()
        assert len(out) == 64
        loads = open(model + ".loads").read().split()
        assert len(loads) == len(set(loads)), loads  # 1 load per pid
        assert 1 <= len(loads) <= 16

    def test_real_model_scorer_matches_local_math(self, spark, tmp_path):
        import zlib

        import numpy as np

        from mofka_spark.operators.quality import (
            classifier_scores,
            hashed_logistic_scorer,
        )

        n = 32
        rng = np.random.default_rng(3)
        w = rng.normal(size=n)
        model = str(tmp_path / "lr.npz")
        np.savez(model, w=w, b=np.float64(-0.5))
        texts = {1: "Alpha beta GAMMA", 2: "", 3: "alpha alpha"}
        docs = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
        got = {
            r["id"]: r["score"]
            for r in classifier_scores(
                docs, scorer=hashed_logistic_scorer(model)
            ).collect()
        }
        for did, t in texts.items():
            z = -0.5  # accumulate in the scorer's exact operand order
            for tok in t.lower().split():
                z += w[zlib.crc32(tok.encode()) % n]
            assert got[did] == pytest.approx(
                1.0 / (1.0 + np.exp(-z)), abs=0
            ), did

    def test_no_shuffle_in_plan(self, spark):
        # inference is scan-local: Arrow batches per input partition,
        # no Exchange anywhere in the scoring stage
        from mofka_spark.operators.quality import classifier_scores

        plan = (
            classifier_scores(self._docs(spark))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "MapInPandas" in plan

    def test_composes_with_blend_scores(self, spark):
        from mofka_spark.operators.quality import (
            blend_scores, classifier_scores,
        )

        sigs = classifier_scores(self._docs(spark)).withColumnRenamed(
            "id", "doc_id"
        )
        out = blend_scores(sigs, {"score": 1.0})
        assert out.count() == 3

    def test_keep_cols_rejects_score_collision(self, spark):
        from mofka_spark.operators.quality import classifier_scores

        df = spark.createDataFrame(
            [(1, "x", 0.5)], "doc_id long, text string, score double"
        )
        with pytest.raises(ValueError, match="score"):
            classifier_scores(df, keep_cols=True)


class TestRetentionCurve:
    def _scored(self, spark):
        rows = [
            (1, "a", 0.9, 10),
            (2, "a", 0.5, 20),
            (3, "a", 0.1, 30),
            (4, "b", 0.5, 40),
            (5, "b", None, 50),       # NULL score: in totals, never kept
            (6, "b", float("nan"), 60),  # NaN score: same
        ]
        return spark.createDataFrame(
            rows, "id long, source string, score double, n_tokens long"
        )

    def test_counts_and_fractions(self, spark):
        from mofka_spark.operators.quality import retention_curve

        out = retention_curve(
            self._scored(spark),
            [0.0, 0.5],
            group_col="source",
            weight_col="n_tokens",
        )
        got = {
            (r["source"], r["threshold"]): r
            for r in out.collect()
        }
        assert got[("a", 0.0)]["n_kept"] == 3
        assert got[("a", 0.5)]["n_kept"] == 2
        assert got[("a", 0.5)]["w_kept"] == 30.0
        assert got[("a", 0.5)]["frac_docs"] == pytest.approx(2 / 3)
        assert got[("a", 0.5)]["frac_weight"] == pytest.approx(30 / 60)
        # b: NULL and NaN rows count in totals (3 docs, 150 tokens)
        # but never clear a threshold — even 0.0
        assert got[("b", 0.0)]["n_kept"] == 1
        assert got[("b", 0.0)]["frac_docs"] == pytest.approx(1 / 3)
        assert got[("b", 0.5)]["w_kept"] == 40.0
        assert got[("b", 0.5)]["frac_weight"] == pytest.approx(40 / 150)

    def test_global_no_weight(self, spark):
        from mofka_spark.operators.quality import retention_curve

        out = retention_curve(self._scored(spark), [0.2]).collect()
        assert len(out) == 1
        assert out[0]["n_kept"] == 3
        assert out[0]["frac_docs"] == pytest.approx(3 / 6)
        assert "w_kept" not in out[0].asDict()
        assert "frac_weight" not in out[0].asDict()

    def test_validation(self, spark):
        from mofka_spark.operators.quality import retention_curve

        with pytest.raises(ValueError, match="non-empty"):
            retention_curve(self._scored(spark), [])
        with pytest.raises(ValueError, match="duplicate"):
            retention_curve(self._scored(spark), [0.1, 0.1])

    def test_empty_input_global(self, spark):
        """A global call on an empty/fully-filtered frame returns one
        row per threshold with ZERO counts (not NULL n_kept / 0-div
        NULL-from-NaN fractions — ADVICE r10); the fractions guard to
        NULL like frac_weight always did."""
        from mofka_spark.operators.quality import retention_curve

        empty = self._scored(spark).filter(F.lit(False))
        got = {
            r["threshold"]: r
            for r in retention_curve(
                empty, [0.0, 0.5], weight_col="n_tokens"
            ).collect()
        }
        assert set(got) == {0.0, 0.5}
        for r in got.values():
            assert r["n_kept"] == 0 and r["w_kept"] == 0.0
            assert r["frac_docs"] is None and r["frac_weight"] is None

    def test_single_aggregate_plan(self, spark):
        """One scan, one exchange: the sweep must be conditional sums
        in a single HashAggregate, not per-threshold passes."""
        from mofka_spark.operators.quality import retention_curve

        out = retention_curve(
            self._scored(spark),
            [0.0, 0.1, 0.2, 0.3],
            group_col="source",
            weight_col="n_tokens",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


class TestModelCacheInvalidation:
    def _save(self, path, w0):
        import numpy as np

        np.savez(path, w=np.full(16, w0), b=np.float64(0.0))

    def test_inplace_retrain_and_vanish(self, tmp_path):
        import os

        import pandas as pd

        from mofka_spark.operators import quality as q

        path = str(tmp_path / "m.npz")
        self._save(path, 1.0)
        scorer = q.hashed_logistic_scorer(path)
        texts = pd.Series(["x"])
        s1 = scorer(texts).iloc[0]
        # retrain in place (distinct mtime_ns forced): new weights
        # must be picked up, not the cached ones
        self._save(path, -1.0)
        os.utime(path, ns=(1, 1))
        s2 = scorer(texts).iloc[0]
        assert s1 != s2
        # file vanishes mid-job: warm cache keeps serving
        os.unlink(path)
        assert scorer(texts).iloc[0] == s2
        # a never-loaded path still raises
        with pytest.raises(OSError):
            q.hashed_logistic_scorer(str(tmp_path / "missing.npz"))(texts)
