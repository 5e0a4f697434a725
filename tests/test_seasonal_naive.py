"""Unit tests for the seasonal-naive forecast operator — hand-computed
grid, calendar-gap honesty, empty/degenerate inputs, partition
invariance. Cross-engine parity rides tests/test_oracle_parity.py."""

from __future__ import annotations

import datetime as dt

import pytest

SCALE = 1 << 20


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )


def _day(d):
    return dt.datetime(2024, 1, 1 + d, 12, 0, 0)


def _run(spark, rows, season=2):
    from kinesis_stream_spark.operators.temporal import seasonal_naive

    return {
        r.key: r
        for r in seasonal_naive(_ev(spark, rows), season=season).collect()
    }


class TestHandComputed:
    def test_season2_grid(self, spark):
        # key 'a': days 0..4 values 10, 20, 10, 20, 14
        rows = [("a", _day(d), v) for d, v in
                enumerate([10.0, 20.0, 10.0, 20.0, 14.0])]
        got = _run(spark, rows, season=2)["a"]
        assert got.n_periods == 5
        # season-2 evaluable: days 2,3,4 -> |10-10|,|20-20|,|14-10|=4
        assert got.n_eval_snaive == 3
        assert got.mae_snaive_fx == (4 * SCALE) // 3
        # naive evaluable: days 1..4 -> 10,10,10,6 -> mean 9
        assert got.n_eval_naive == 4
        assert got.mae_naive_fx == 9 * SCALE
        assert got.mase_ppm == (((4 * SCALE) // 3) * 1_000_000) // (9 * SCALE)
        # next-day forecast = v(5 - 2) = v(day 3) = 20
        assert got.forecast_next_fx == 20 * SCALE
        assert got.forecast_next == 20.0

    def test_calendar_gap_is_not_an_array_lag(self, spark):
        # days 0, 1, 3 (day 2 missing): season=2 eval only at day 3
        # (day 1 observed); naive eval only at day 1 (day 2's
        # predecessor is missing for day 3)
        rows = [("a", _day(0), 5.0), ("a", _day(1), 7.0), ("a", _day(3), 9.0)]
        got = _run(spark, rows, season=2)["a"]
        assert got.n_periods == 3
        assert got.n_eval_snaive == 1          # day 3 vs day 1
        assert got.mae_snaive_fx == 2 * SCALE
        assert got.n_eval_naive == 1           # day 1 vs day 0
        assert got.mae_naive_fx == 2 * SCALE
        assert got.mase_ppm == 1_000_000
        # forecast for day 4 = v(day 2) -> never observed -> NULL
        assert got.forecast_next_fx is None and got.forecast_next is None

    def test_short_history_nulls(self, spark):
        rows = [("a", _day(0), 5.0)]
        got = _run(spark, rows, season=7)["a"]
        assert got.n_periods == 1
        assert got.n_eval_snaive == 0 and got.n_eval_naive == 0
        assert got.mae_snaive_fx is None and got.mae_naive_fx is None
        assert got.mase_ppm is None


class TestContract:
    def test_null_ts_and_value_excluded(self, spark):
        rows = [
            ("a", _day(0), 5.0),
            ("a", None, 99.0),
            ("a", _day(1), None),
        ]
        got = _run(spark, rows)["a"]
        assert got.n_periods == 1

    def test_empty_input(self, spark):
        assert _run(spark, []) == {}

    def test_validation(self, spark):
        from kinesis_stream_spark.operators.temporal import seasonal_naive

        with pytest.raises(ValueError, match="season"):
            seasonal_naive(_ev(spark, []), season=0)

    def test_partition_invariance(self, spark):
        rows = [
            (k, _day(d), float((d * 13 + i) % 37))
            for i, k in enumerate(["a", "b", "c"])
            for d in range(0, 20, 1 + i)
        ]
        from kinesis_stream_spark.operators.temporal import seasonal_naive

        base = sorted(map(str, seasonal_naive(_ev(spark, rows)).collect()))
        re7 = sorted(
            map(
                str,
                seasonal_naive(_ev(spark, rows).repartition(7)).collect(),
            )
        )
        assert re7 == base
