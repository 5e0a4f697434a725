"""Unit tests for the round-9 inequality/trend/drift operators: Gini
concentration, Theil-Sen robust slope, mix-shift drift, Markov
stationary distribution, Apdex — hand-computed fixtures plus the
degenerate inputs the synthetic corpus never exercises. Cross-engine
parity is covered by tests/test_oracle_parity.py; these pin the MATH.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


class TestGiniConcentration:
    def _run(self, spark, rows):
        from kinesis_stream_spark.operators.skew import gini_concentration

        df = spark.createDataFrame(rows, "grp string, key long, v double")
        return {
            r["group_key"]: r
            for r in gini_concentration(
                df, group_col="grp", key_col="key", val_col="v"
            ).collect()
        }

    def test_all_equal_is_zero(self, spark):
        out = self._run(
            spark, [("a", k, 10.0) for k in range(1, 5)]
        )
        assert out["a"]["n_keys"] == 4
        assert out["a"]["gini_ppm"] == 0

    def test_total_concentration_approaches_one(self, spark):
        # one key holds everything: G = (n-1)/n = 0.75 for n = 4
        out = self._run(
            spark,
            [("a", 1, 0.0), ("a", 2, 0.0), ("a", 3, 0.0), ("a", 4, 100.0)],
        )
        assert out["a"]["gini_ppm"] == 750_000

    def test_hand_computed_mid_case(self, spark):
        # x = (1, 2, 3, 4): G = (2·(1+4+9+16) − 5·10) / (4·10) = 0.25
        out = self._run(
            spark, [("a", k, float(k)) for k in range(1, 5)]
        )
        assert out["a"]["gini_ppm"] == 250_000

    def test_zero_total_is_null(self, spark):
        out = self._run(spark, [("a", 1, 0.0), ("a", 2, 0.0)])
        assert out["a"]["gini_ppm"] is None

    def test_null_keys_and_values_excluded(self, spark):
        from kinesis_stream_spark.operators.skew import gini_concentration

        df = spark.createDataFrame(
            [("a", 1, 5.0), ("a", None, 99.0), ("a", 2, None), ("a", 3, 5.0)],
            "grp string, key long, v double",
        )
        out = gini_concentration(
            df, group_col="grp", key_col="key", val_col="v"
        ).collect()
        assert out[0]["n_keys"] == 2
        assert out[0]["gini_ppm"] == 0

    def test_empty_input(self, spark):
        from kinesis_stream_spark.operators.skew import gini_concentration

        df = spark.createDataFrame([], "grp string, key long, v double")
        assert (
            gini_concentration(
                df, group_col="grp", key_col="key", val_col="v"
            ).count()
            == 0
        )


class TestTheilSen:
    def test_clean_linear_series_recovers_slope(self, spark):
        from kinesis_stream_spark.operators.temporal import theil_sen_trend

        # value sum rises exactly 2.0/day for 5 days
        rows = [
            (d, _ts(d), 1, "click", 10.0 + 2.0 * d) for d in range(1, 6)
        ]
        out = theil_sen_trend(_ev(spark, rows)).collect()
        assert len(out) == 1
        assert out[0]["n_periods"] == 5
        assert out[0]["n_pairs"] == 10
        assert out[0]["sen_slope"] == pytest.approx(2.0, abs=1e-5)

    def test_outlier_day_barely_moves_median(self, spark):
        from kinesis_stream_spark.operators.temporal import (
            linear_trend,
            theil_sen_trend,
        )

        # 9 clean days of slope 1, one corrupted day at 1000×
        rows = [(d, _ts(d), 1, "click", float(d)) for d in range(1, 10)]
        rows.append((10, _ts(10), 1, "click", 5000.0))
        ev = _ev(spark, rows)
        sen = theil_sen_trend(ev).collect()[0]
        ols = linear_trend(ev, key_col="event_type").collect()[0]
        assert sen["sen_slope"] == pytest.approx(1.0, rel=0.2)
        assert ols["slope"] > 100  # OLS dragged by 2 orders of magnitude

    def test_single_day_key_absent(self, spark):
        from kinesis_stream_spark.operators.temporal import theil_sen_trend

        rows = [
            (1, _ts(1), 1, "lonely", 5.0),
            (2, _ts(1), 1, "paired", 1.0),
            (3, _ts(2), 1, "paired", 2.0),
        ]
        out = {
            r["key"]: r for r in theil_sen_trend(_ev(spark, rows)).collect()
        }
        assert "lonely" not in out
        assert out["paired"]["n_pairs"] == 1

    def test_even_pair_count_averages_middles(self, spark):
        from kinesis_stream_spark.operators.temporal import theil_sen_trend

        # 3 days -> 3 pairwise slopes? no: C(3,2) = 3 (odd). Use 4 days
        # with distinct slopes -> 6 pairs, median = mean of 3rd & 4th.
        vals = {1: 0.0, 2: 1.0, 3: 4.0, 4: 6.0}
        rows = [(d, _ts(d), 1, "click", vals[d]) for d in vals]
        # pairwise slopes: 1-2:1, 1-3:2, 1-4:2, 2-3:3, 2-4:2.5, 3-4:2
        # sorted: 1, 2, 2, 2, 2.5, 3 -> median = (2+2)/2 = 2
        out = theil_sen_trend(_ev(spark, rows)).collect()[0]
        assert out["n_pairs"] == 6
        assert out["sen_slope"] == pytest.approx(2.0, abs=1e-5)

    def test_null_ts_excluded(self, spark):
        from kinesis_stream_spark.operators.temporal import theil_sen_trend

        rows = [
            (1, _ts(1), 1, "click", 1.0),
            (2, _ts(2), 1, "click", 2.0),
            (3, None, 1, "click", 999.0),
        ]
        out = theil_sen_trend(_ev(spark, rows)).collect()[0]
        assert out["n_periods"] == 2


class TestMixShift:
    def test_hand_computed_halves(self, spark):
        from kinesis_stream_spark.operators.temporal import mix_shift

        # span 1..31; midpoint day 16 -> before: days 1-16, after: rest
        rows = (
            [(i, _ts(1), 1, "a", 0.0) for i in range(3)]
            + [(10 + i, _ts(1), 1, "b", 0.0) for i in range(1)]
            + [(20 + i, _ts(31), 1, "b", 0.0) for i in range(4)]
        )
        out = {r["key"]: r for r in mix_shift(_ev(spark, rows)).collect()}
        assert out["a"]["n_before"] == 3 and out["a"]["n_after"] == 0
        assert out["b"]["n_before"] == 1 and out["b"]["n_after"] == 4
        assert out["a"]["p_ppm"] == 750_000 and out["a"]["q_ppm"] == 0
        assert out["b"]["q_ppm"] == 1_000_000
        # rate ratio for b: (4/4) / (1/4) = 4
        assert out["b"]["rate_ratio_ppm"] == 4_000_000
        # new-category guard: a has q/p defined, a's ratio = 0
        assert out["a"]["rate_ratio_ppm"] == 0

    def test_single_timestamp_degenerate(self, spark):
        from kinesis_stream_spark.operators.temporal import mix_shift

        rows = [(i, _ts(5), 1, "a", 0.0) for i in range(3)]
        out = mix_shift(_ev(spark, rows)).collect()[0]
        assert out["n_before"] == 3 and out["n_after"] == 0
        assert out["q_ppm"] is None and out["rate_ratio_ppm"] is None

    def test_empty_input(self, spark):
        from kinesis_stream_spark.operators.temporal import mix_shift

        assert mix_shift(_ev(spark, [])).count() == 0


class TestMarkovStationary:
    def test_two_state_chain_converges_to_known_pi(self, spark):
        from kinesis_stream_spark.operators.temporal import markov_stationary

        # one user alternating a->b->a->b... P(a->b)=1, P(b->a)=1:
        # stationary pi = (1/2, 1/2) and power iteration from uniform
        # hits it exactly at every round
        rows = [
            (i, _ts(1 + i // 24, i % 24), 1, "a" if i % 2 == 0 else "b", 0.0)
            for i in range(20)
        ]
        out = {
            r["state"]: r
            for r in markov_stationary(_ev(spark, rows)).collect()
        }
        assert out["a"]["pi"] == pytest.approx(0.5, abs=1e-9)
        assert out["b"]["pi"] == pytest.approx(0.5, abs=1e-9)

    def test_mass_conservation_bound(self, spark):
        from kinesis_stream_spark.operators.temporal import (
            MARKOV_SCALE,
            markov_stationary,
        )

        rows = [
            (i, _ts(1 + i // 20, i % 20), i % 3,
             ["a", "b", "c", "a", "b"][i % 5], 0.0)
            for i in range(60)
        ]
        out = markov_stationary(_ev(spark, rows), iterations=4).collect()
        total = sum(r["pi_fx"] for r in out)
        # floor division leaks at most (|states|² + |states|) quanta
        # per round; 4 rounds over 3 states is < 100 quanta of 2^40
        assert MARKOV_SCALE - 100 <= total <= MARKOV_SCALE

    def test_absorbing_state_redistributes(self, spark):
        from kinesis_stream_spark.operators.temporal import markov_stationary

        # single transition a->b: b has no outgoing edges, so its mass
        # redistributes uniformly each round (dangling rule) instead of
        # sinking the chain
        rows = [(1, _ts(1), 1, "a", 0.0), (2, _ts(2), 1, "b", 0.0)]
        out = {
            r["state"]: r
            for r in markov_stationary(
                _ev(spark, rows), iterations=3
            ).collect()
        }
        assert set(out) == {"a", "b"}
        assert out["a"]["pi_fx"] > 0 and out["b"]["pi_fx"] > 0

    def test_empty_input(self, spark):
        from kinesis_stream_spark.operators.temporal import markov_stationary

        assert markov_stationary(_ev(spark, [])).count() == 0


class TestApdex:
    def test_hand_computed_buckets(self, spark):
        from kinesis_stream_spark.operators.experiment import apdex_score

        # T = 10: satisfied ≤ 10, tolerating ≤ 40
        vals = [5.0, 10.0, 11.0, 40.0, 41.0, 1000.0]
        rows = [(i, _ts(1), 1, "a", v) for i, v in enumerate(vals)]
        out = apdex_score(_ev(spark, rows), threshold=10.0).collect()[0]
        assert out["n_satisfied"] == 2
        assert out["n_tolerating"] == 2
        assert out["n_frustrated"] == 2
        # (2·2 + 2) / (2·6) = 0.5
        assert out["apdex_ppm"] == 500_000

    def test_null_values_excluded(self, spark):
        from kinesis_stream_spark.operators.experiment import apdex_score

        rows = [(1, _ts(1), 1, "a", 5.0), (2, _ts(1), 1, "a", None)]
        out = apdex_score(_ev(spark, rows), threshold=10.0).collect()[0]
        assert out["n"] == 1 and out["apdex_ppm"] == 1_000_000

    def test_bad_threshold_raises(self, spark):
        from kinesis_stream_spark.operators.experiment import apdex_score

        with pytest.raises(ValueError):
            apdex_score(_ev(spark, []), threshold=0.0)
