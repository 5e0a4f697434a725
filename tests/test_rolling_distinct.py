"""Unit tests for the rolling distinct-count engagement curve —
hand-computed grid incl. quiet days and over-window gaps, dedup of
multi-contribution ids, contracts, partition invariance."""

from __future__ import annotations

import datetime as dt

import pytest


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def _d(day, hour=9):
    return dt.datetime(2024, 1, 1 + day, hour)


def _run(spark, rows, window=3):
    from kinesis_stream_spark.operators.temporal import rolling_distinct

    out = rolling_distinct(_ev(spark, rows), window=window).collect()
    rel = {}
    if out:
        base = min(r.day_bucket for r in out)
        rel = {r.day_bucket - base: r for r in out}
    return rel


class TestHandComputed:
    def test_window3_grid(self, spark):
        rows = [
            (1, _d(0)), (2, _d(0)),
            (1, _d(1)), (1, _d(1, 15)),   # same user twice on day 1
            (3, _d(4)),
        ]
        got = _run(spark, rows, window=3)
        # full grid 0..4
        assert sorted(got) == [0, 1, 2, 3, 4]
        assert (got[0].dau, got[0].wau) == (2, 2)
        assert (got[1].dau, got[1].wau) == (1, 2)      # users {1,2}
        assert (got[2].dau, got[2].wau) == (0, 2)      # quiet day, window holds 0,1
        assert (got[3].dau, got[3].wau) == (0, 1)      # only day 1 visible
        assert (got[4].dau, got[4].wau) == (1, 1)      # user 3
        assert got[2].stickiness_ppm == 0
        assert got[1].stickiness_ppm == 500_000
        assert got[4].stickiness_ppm == 1_000_000

    def test_gap_longer_than_window(self, spark):
        rows = [(1, _d(0)), (1, _d(10))]
        got = _run(spark, rows, window=3)
        assert (got[5].dau, got[5].wau) == (0, 0)
        assert got[5].stickiness_ppm is None

    def test_multi_source_contribution_counts_once(self, spark):
        # user active day 0 AND day 1: day 1's window sees them ONCE
        # (and day 2 is past the max observed day — grid clips there)
        rows = [(1, _d(0)), (1, _d(1))]
        got = _run(spark, rows, window=3)
        assert got[1].wau == 1
        assert sorted(got) == [0, 1]


class TestContracts:
    def test_nulls_excluded_and_empty(self, spark):
        from kinesis_stream_spark.operators.temporal import rolling_distinct

        rows = [(None, _d(0)), (1, None)]
        assert rolling_distinct(_ev(spark, rows)).collect() == []
        assert rolling_distinct(_ev(spark, [])).collect() == []

    def test_validation(self, spark):
        from kinesis_stream_spark.operators.temporal import rolling_distinct

        with pytest.raises(ValueError, match="window"):
            rolling_distinct(_ev(spark, []), window=0)

    def test_partition_invariance(self, spark):
        from kinesis_stream_spark.operators.temporal import rolling_distinct

        rows = [
            ((i * 5) % 11, _d(i % 13, i % 23))
            for i in range(120)
        ]
        base = sorted(map(str, rolling_distinct(_ev(spark, rows)).collect()))
        re9 = sorted(
            map(
                str,
                rolling_distinct(_ev(spark, rows).repartition(9)).collect(),
            )
        )
        assert re9 == base
