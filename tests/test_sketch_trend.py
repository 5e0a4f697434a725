"""HLL distinct sketch (operators/hll.py), OLS linear trend and
day-of-week seasonal profile (operators/temporal.py) against hand-built
fixtures and analytic ground truth. Cross-engine parity for the
registered queries runs in test_oracle_parity.py."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from kinesis_stream_spark.operators.hll import (
    HLL_M,
    hll_distinct,
)
from kinesis_stream_spark.operators.temporal import (
    EWMA_SCALE,
    linear_trend,
    seasonal_profile,
)


def test_hll_estimate_within_error_band(spark):
    """m = 1024 registers -> standard error ~1.04/sqrt(m) = 3.25%;
    assert the estimate lands within 4 sigma on a known cardinality
    (deterministic md5 hashing makes this repeatable, not flaky)."""
    n = 50_000
    df = spark.range(n).select(F.col("id").alias("k"))
    r = hll_distinct(df, ["k"]).collect()[0]
    assert r.exact_distinct == n
    assert abs(r.rel_err) < 4 * 1.04 / (HLL_M ** 0.5)
    assert r.n_rows == n


def test_hll_small_range_correction_engages(spark):
    """Cardinality << m must route through the linear-counting branch
    (raw HLL overestimates badly in this regime) and land tight."""
    df = spark.range(200).select(F.col("id").alias("k"))
    r = hll_distinct(df, ["k"]).collect()[0]
    assert r.zero_registers > 0
    assert r.hll_estimate != r.raw_estimate  # correction applied
    assert abs(r.rel_err) < 0.05


def test_hll_ignores_nulls_and_duplicates(spark):
    rows = [(1,), (1,), (2,), (None,)] * 10
    df = spark.createDataFrame(rows, "k long")
    r = hll_distinct(df, ["k"]).collect()[0]
    assert r.n_rows == 30  # non-null rows
    assert r.exact_distinct == 2
    with pytest.raises(ValueError):
        hll_distinct(df, [])


def test_hll_registers_merge_like_max(spark):
    """Mergeability: the harmonic sum of the union equals the sketch
    built from register-wise MAX of two halves — i.e. building the
    sketch on the union or merging per-partition sketches is the same
    aggregate (the 100 TB property)."""
    a = spark.range(0, 3000).select(F.col("id").alias("k"))
    b = spark.range(1500, 4500).select(F.col("id").alias("k"))
    whole = hll_distinct(a.unionAll(b), ["k"]).collect()[0]
    # rebuilding on the distinct union must give identical registers:
    # MAX over the same value set regardless of duplication/partition
    dedup = hll_distinct(a.unionAll(b).distinct(), ["k"]).collect()[0]
    assert whole.harmonic_sum_fx == dedup.harmonic_sum_fx
    assert whole.hll_estimate == dedup.hll_estimate


def test_linear_trend_recovers_exact_line(spark):
    """y = 3 + 2x on 5 consecutive days is fit exactly: integer fx
    moments make the closed form exact up to the final divides."""
    rows = [
        (1, dt.datetime(2024, 1, 1 + d, 12), float(3 + 2 * d))
        for d in range(5)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    r = linear_trend(df).collect()[0]
    assert r.n_periods == 5
    assert r.slope == pytest.approx(2.0, abs=1e-6)
    assert r.intercept == pytest.approx(3.0, abs=1e-6)
    # forecast at x = n (the next period): 3 + 2*5 = 13
    assert r.forecast_next == pytest.approx(13.0, abs=1e-6)
    assert r.slope_fx_per_period == pytest.approx(2.0 * EWMA_SCALE, abs=1.0)


def test_linear_trend_forecast_beyond_gapped_span(spark):
    """Gapped key (days 0 and 10): forecast_next must evaluate at
    x = max(x) + 1 = 11 (after the LAST observation), never at
    x = n_periods = 2 (inside the observed span)."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 12), 0.0),
        (1, dt.datetime(2024, 1, 11, 12), 20.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    r = linear_trend(df).collect()[0]
    assert r.slope == pytest.approx(2.0, abs=1e-6)
    assert r.forecast_next == pytest.approx(22.0, abs=1e-5)


def test_linear_trend_single_period_null_slope(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 7.0)],
        "user_id long, ts timestamp, value double",
    )
    r = linear_trend(df).collect()[0]
    assert r.n_periods == 1 and r.slope is None


def test_linear_trend_excludes_null_ts(spark):
    clean = [
        (1, dt.datetime(2024, 1, 1 + d, 12), float(d)) for d in range(3)
    ]
    schema = "user_id long, ts timestamp, value double"
    a = linear_trend(spark.createDataFrame(clean, schema)).collect()
    b = linear_trend(
        spark.createDataFrame(clean + [(1, None, 99.0)], schema)
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_seasonal_profile_hand_fixture(spark):
    """Two weekday slots with 2:1 means -> indexes 4/3 and 2/3
    (mean_key = (2·2 + 1·1)/3 rows... computed per-row, not per-slot)."""
    # slot of 2024-01-01 (epoch day 19723): 19723 % 7 == 4
    rows = [
        (1, dt.datetime(2024, 1, 1, 1), "a", 2.0),   # slot 4
        (2, dt.datetime(2024, 1, 1, 2), "a", 2.0),   # slot 4
        (3, dt.datetime(2024, 1, 2, 1), "a", 1.0),   # slot 5
        (4, None, "a", 50.0),                        # excluded: NULL ts
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = {r.dow_slot: r for r in seasonal_profile(df).collect()}
    assert set(got) == {4, 5}
    assert got[4].n_events == 2 and got[4].mean_value == pytest.approx(2.0)
    assert got[5].n_events == 1 and got[5].mean_value == pytest.approx(1.0)
    overall = 5.0 / 3.0
    assert got[4].seasonal_index == pytest.approx(2.0 / overall)
    assert got[5].seasonal_index == pytest.approx(1.0 / overall)


def test_hll_empty_column_null_rel_err(spark):
    """All-NULL column: exact = 0 -> NULL rel_err (not a DIVIDE_BY_ZERO
    under the session's ANSI default)."""
    df = spark.createDataFrame([(None,), (None,)], "k string")
    r = hll_distinct(df, ["k"]).collect()[0]
    assert r.exact_distinct == 0 and r.rel_err is None


def test_seasonal_profile_zero_sum_null_index(spark):
    """A key whose values sum to 0 has no baseline: NULL index."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 1), "a", 0.0),
        (2, dt.datetime(2024, 1, 2, 1), "a", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    for r in seasonal_profile(df).collect():
        assert r.seasonal_index is None
