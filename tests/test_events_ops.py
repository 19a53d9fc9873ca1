"""funnel_conversion / cohort_retention operator tests."""

import datetime

from pyspark.sql import functions as F

from mofka_spark import plans
from mofka_spark.operators import events as ev_ops


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts"])


def _t(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


class TestFunnel:
    def test_strict_ordering(self, spark):
        rows = [
            # u1 converts fully in order
            (1, "view", _t(1)), (1, "click", _t(2)), (1, "purchase", _t(3)),
            # u2 clicked BEFORE viewing: click must not count
            (2, "click", _t(1)), (2, "view", _t(2)),
            # u3 view only
            (3, "view", _t(1)),
            # u4 never viewed: purchase can't count anywhere
            (4, "purchase", _t(1)),
        ]
        out = {
            r.step: r
            for r in ev_ops.funnel_conversion(
                _ev(spark, rows), ["view", "click", "purchase"]
            ).collect()
        }
        assert out["view"].n_users == 3
        assert out["click"].n_users == 1
        assert out["purchase"].n_users == 1
        assert out["view"].conversion == 1.0
        assert abs(out["click"].conversion - 1 / 3) < 1e-6

    def test_ties_are_strict(self, spark):
        rows = [(1, "view", _t(1)), (1, "click", _t(1))]  # same instant
        out = {
            r.step: r.n_users
            for r in ev_ops.funnel_conversion(
                _ev(spark, rows), ["view", "click"]
            ).collect()
        }
        assert out["view"] == 1 and out["click"] == 0

    def test_no_window_no_cartesian(self, spark):
        rows = [(1, "view", _t(1))]
        df = ev_ops.funnel_conversion(_ev(spark, rows), ["view", "click"])
        p = plans.plan_string(df)
        assert "Window" not in p and "CartesianProduct" not in p


class TestCohortRetention:
    def test_matrix(self, spark):
        day = 86400
        rows = [
            # u1 first in period 0, active periods 0,1,2
            (1, "e", _t(1)), (1, "e", _t(2)), (1, "e", _t(3)),
            # u2 first in period 0, active 0 only
            (2, "e", _t(1, 12)),
            # u3 first in period 1, active 1,2
            (3, "e", _t(2)), (3, "e", _t(3, 6)),
        ]
        out = ev_ops.cohort_retention(
            _ev(spark, rows), period_seconds=day, max_periods=10
        ).collect()
        m = {(r.cohort - min(x.cohort for x in out), r.offset): r for r in out}
        assert m[(0, 0)].n_active == 2 and m[(0, 0)].retention == 1.0
        assert m[(0, 1)].n_active == 1 and m[(0, 1)].retention == 0.5
        assert m[(1, 0)].n_active == 1
        assert m[(1, 1)].n_active == 1

    def test_max_periods_cap(self, spark):
        rows = [(1, "e", _t(1)), (1, "e", _t(30))]
        out = ev_ops.cohort_retention(
            _ev(spark, rows), period_seconds=86400, max_periods=5
        ).collect()
        assert all(r.offset < 5 for r in out)


class TestTimeDecayedAverage:
    def test_recency_weighting(self, spark):
        # values 10 (old) and 20 (recent, one halflife later):
        # weights 0.5 and 1.0 -> ewma = (10*0.5 + 20) / 1.5
        rows = [(1, "e", _t(1), 10.0), (1, "e", _t(2), 20.0)]
        df = spark.createDataFrame(
            rows, ["user_id", "event_type", "ts", "value"]
        )
        out = ev_ops.time_decayed_average(
            df, halflife_seconds=86400.0
        ).collect()
        assert out[0].n_events == 2
        assert abs(out[0].ewma - (10 * 0.5 + 20) / 1.5) < 1e-6

    def test_order_independent(self, spark):
        rows = [(1, "e", _t(d), float(d)) for d in (3, 1, 2)]
        df = spark.createDataFrame(
            rows, ["user_id", "event_type", "ts", "value"]
        )
        a = ev_ops.time_decayed_average(df).collect()[0].ewma
        b = ev_ops.time_decayed_average(
            df.orderBy("value")
        ).collect()[0].ewma
        assert a == b

    def test_no_window_in_plan(self, spark):
        rows = [(1, "e", _t(1), 1.0)]
        df = spark.createDataFrame(
            rows, ["user_id", "event_type", "ts", "value"]
        )
        assert "Window" not in plans.plan_string(
            ev_ops.time_decayed_average(df)
        )


class TestTransitionMatrix:
    def test_counts_and_probabilities(self, spark):
        rows = [
            # u1: view -> click -> view ; u2: view -> click
            (1, "view", _t(1), 1),
            (1, "click", _t(2), 2),
            (1, "view", _t(3), 3),
            (2, "view", _t(1), 4),
            (2, "click", _t(2), 5),
        ]
        df = spark.createDataFrame(
            rows, ["user_id", "event_type", "ts", "event_id"]
        )
        out = {
            (r.from_type, r.to_type): (r.n_transitions, r.probability)
            for r in ev_ops.transition_matrix(df).collect()
        }
        assert out[("view", "click")] == (2, 1.0)
        assert out[("click", "view")] == (1, 1.0)
        assert ("click", "click") not in out

    def test_no_cross_user_transitions(self, spark):
        # consecutive rows globally, but different users: no edge
        rows = [(1, "view", _t(1), 1), (2, "click", _t(2), 2)]
        df = spark.createDataFrame(
            rows, ["user_id", "event_type", "ts", "event_id"]
        )
        assert ev_ops.transition_matrix(df).count() == 0

    def test_tiebreak_on_order_col(self, spark):
        # same timestamp: event_id breaks the tie deterministically
        rows = [(1, "a", _t(1), 2), (1, "b", _t(1), 1)]
        df = spark.createDataFrame(
            rows, ["user_id", "event_type", "ts", "event_id"]
        )
        out = ev_ops.transition_matrix(df).collect()
        assert len(out) == 1
        assert (out[0].from_type, out[0].to_type) == ("b", "a")


class TestRollingActiveUsers:
    def test_window_counts(self, spark):
        rows = [
            (1, "e", _t(1)),
            (2, "e", _t(1)),
            (1, "e", _t(3)),
            (3, "e", _t(10)),
        ]
        df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
        out = {
            r.day.day: r.n_active
            for r in ev_ops.rolling_active_users(df, window_days=7).collect()
        }
        # day 1: users {1,2}; day 3: {1,2} (window) ∪ {1} = {1,2};
        # day 7: still {1,2} (day1 in window); day 8: only day3's {1};
        # day 10: {3} plus day-3 activity is out of window (3+7=10>... )
        assert out[1] == 2
        assert out[3] == 2
        assert out[7] == 2
        assert out[8] == 1
        assert out[9] == 1  # day 3 activity covers through day 9
        assert out[10] == 1  # only user 3
        # no bucket past the last event day
        assert max(out) == 10

    def test_multiple_events_one_user_count_once(self, spark):
        rows = [(1, "a", _t(2)), (1, "b", _t(2)), (1, "c", _t(2))]
        df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
        out = ev_ops.rolling_active_users(df).collect()
        assert all(r.n_active == 1 for r in out)


class TestHistoryIntervals:
    def test_collapse_and_intervals(self, spark):
        rows = [
            (1, "bronze", _t(1), 1),
            (1, "bronze", _t(2), 2),  # heartbeat, collapsed
            (1, "silver", _t(3), 3),
            (1, "bronze", _t(5), 4),  # back to bronze = new interval
            (2, "gold", _t(1), 5),
        ]
        df = spark.createDataFrame(
            rows, ["user_id", "event_type", "ts", "event_id"]
        )
        out = sorted(
            (
                (r.user_id, r.event_type, r.valid_from.day,
                 r.valid_to.day if r.valid_to else None)
                for r in ev_ops.history_intervals(
                    df, "user_id", "ts", "event_type"
                ).collect()
            )
        )
        assert out == [
            (1, "bronze", 1, 3),
            (1, "bronze", 5, None),
            (1, "silver", 3, 5),
            (2, "gold", 1, None),
        ]

    def test_no_collapse_keeps_heartbeats(self, spark):
        rows = [(1, "a", _t(1), 1), (1, "a", _t(2), 2)]
        df = spark.createDataFrame(
            rows, ["user_id", "event_type", "ts", "event_id"]
        )
        out = ev_ops.history_intervals(
            df, "user_id", "ts", "event_type", collapse=False
        ).collect()
        assert len(out) == 2

    def test_null_runs_collapse_once(self, spark):
        rows = [(1, None, _t(1), 1), (1, None, _t(2), 2), (1, "x", _t(3), 3)]
        df = spark.createDataFrame(
            rows, ["user_id", "event_type", "ts", "event_id"]
        )
        out = ev_ops.history_intervals(
            df, "user_id", "ts", "event_type"
        ).collect()
        assert len(out) == 2  # one NULL interval, one 'x' interval


class TestPathCounts:
    def test_paths_and_min_count(self, spark):
        rows = [
            (1, "a", _t(1), 1), (1, "b", _t(2), 2), (1, "c", _t(3), 3),
            (1, "d", _t(4), 4),
            (2, "a", _t(1), 5), (2, "b", _t(2), 6), (2, "c", _t(3), 7),
        ]
        df = spark.createDataFrame(
            rows, ["user_id", "event_type", "ts", "event_id"]
        )
        out = {
            (r.step_1, r.step_2, r.step_3): r.n_paths
            for r in ev_ops.path_counts(df, path_len=3).collect()
        }
        assert out[("a", "b", "c")] == 2
        assert out[("b", "c", "d")] == 1
        assert ev_ops.path_counts(df, path_len=3, min_count=2).count() == 1

    def test_single_window_in_plan(self, spark):
        from mofka_spark import plans

        rows = [(1, "a", _t(1), 1)]
        df = spark.createDataFrame(
            rows, ["user_id", "event_type", "ts", "event_id"]
        )
        import re

        p = plans.plan_string(ev_ops.path_counts(df, path_len=4))
        # all lead steps share one Window operator / one sort (each
        # physical operator appears once as "(n) Window" in the
        # formatted detail section)
        assert len(re.findall(r"\(\d+\) Window", p)) == 1
        assert len(re.findall(r"\(\d+\) Sort", p)) == 1


class TestValueTrend:
    def test_exact_line_recovered(self, spark):
        import datetime

        # y = 2*x + 5 sampled at x = 0, 10, 20 seconds
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (1, base + datetime.timedelta(seconds=s), 2.0 * s + 5.0)
            for s in (0, 10, 20)
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        out = ev_ops.value_trend(df).collect()[0]
        assert out.n_events == 3
        assert out.slope == 2.0
        assert out.intercept == 5.0

    def test_constant_time_key_dropped(self, spark):
        import datetime

        t = datetime.datetime(2024, 1, 1)
        rows = [(1, t, 1.0), (1, t, 2.0)]  # zero time variance
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        assert ev_ops.value_trend(df).count() == 0

    def test_no_window_in_plan(self, spark):
        import datetime

        from mofka_spark import plans

        rows = [(1, datetime.datetime(2024, 1, 1), 1.0)]
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        assert "Window" not in plans.plan_string(ev_ops.value_trend(df))

    def test_sums_method_matches_exact(self, spark):
        import datetime
        import random

        rng = random.Random(7)
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (
                u,
                base + datetime.timedelta(seconds=rng.randrange(0, 86400)),
                rng.uniform(-50.0, 50.0),
            )
            for u in range(5)
            for _ in range(40)
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        exact = {
            r.user_id: r for r in ev_ops.value_trend(df).collect()
        }
        sums = {
            r.user_id: r
            for r in ev_ops.value_trend(df, method="sums").collect()
        }
        assert exact.keys() == sums.keys()
        for k in exact:
            assert exact[k].n_events == sums[k].n_events
            assert abs(exact[k].slope - sums[k].slope) <= 1e-6
            assert abs(exact[k].intercept - sums[k].intercept) <= 1e-6

    def test_sums_method_has_constant_state(self, spark):
        import datetime

        from mofka_spark import plans

        rows = [(1, datetime.datetime(2024, 1, 1), 1.0)]
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        p = plans.plan_string(ev_ops.value_trend(df, method="sums"))
        # the scale path must not collect per-key arrays
        assert "collect_list" not in p
        assert "Window" not in p

    def test_max_events_cap_keeps_earliest(self, spark):
        import datetime

        base = datetime.datetime(2024, 1, 1)
        # y = 3x + 1 for the first 5 seconds, then a wild outlier tail
        rows = [
            (1, base + datetime.timedelta(seconds=s), 3.0 * s + 1.0)
            for s in range(5)
        ] + [
            (1, base + datetime.timedelta(seconds=1000 + s), 1e6)
            for s in range(3)
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        out = ev_ops.value_trend(df, max_events_per_key=5).collect()[0]
        assert out.n_events == 5
        assert out.slope == 3.0
        assert out.intercept == 1.0

    def test_null_ts_rows_excluded_not_poisoning(self, spark):
        import datetime

        base = datetime.datetime(2024, 1, 1)
        rows = [
            (1, None, 99.0),  # null ts must not null t0 / drop the key
            (1, base, 5.0),
            (1, base + datetime.timedelta(seconds=10), 25.0),
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        out = ev_ops.value_trend(df).collect()
        assert len(out) == 1
        assert out[0].n_events == 2
        assert out[0].slope == 2.0
        assert out[0].intercept == 5.0

    def test_zero_slope_is_positive_zero(self, spark):
        import datetime
        import math

        base = datetime.datetime(2024, 1, 1)
        rows = [
            (1, base + datetime.timedelta(seconds=s), 7.0) for s in range(3)
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        for method in ("exact", "sums"):
            out = ev_ops.value_trend(df, method=method).collect()[0]
            assert out.slope == 0.0
            assert not math.copysign(1.0, out.slope) < 0

    def test_unknown_method_rejected(self, spark):
        import datetime

        import pytest

        rows = [(1, datetime.datetime(2024, 1, 1), 1.0)]
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        with pytest.raises(ValueError, match="unknown method"):
            ev_ops.value_trend(df, method="bogus")
