"""HLL set operations + histogram quantile sketch (operators/hll.py,
operators/quantiles.py) and the Kaplan-Meier survival curve
(operators/temporal.py) against hand-built fixtures / analytic truth.
Cross-engine parity for the registered queries runs in
test_oracle_parity.py."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from kinesis_stream_spark.operators.hll import HLL_M, hll_set_ops
from kinesis_stream_spark.operators.quantiles import histogram_quantiles
from kinesis_stream_spark.operators.temporal import KM_SCALE, survival_curve


def test_hll_set_ops_union_is_register_merge(spark):
    """Union estimate from merged registers must EQUAL the estimate of
    a rescan of the union — register-wise MAX is lossless."""
    a = spark.range(0, 6000).select(F.col("id").alias("k"))
    b = spark.range(3000, 9000).select(F.col("id").alias("k"))
    got = {r.set_op: r for r in hll_set_ops(a, b, col_a="k", col_b="k").collect()}
    assert got["a"].exact == 6000 and got["b"].exact == 6000
    assert got["union"].exact == 9000 and got["intersection"].exact == 3000
    # merged-register union estimate == direct sketch of the union
    from kinesis_stream_spark.operators.hll import hll_distinct

    direct = hll_distinct(a.unionAll(b), ["k"]).collect()[0]
    assert got["union"].estimate == direct.hll_estimate
    # inclusion-exclusion identity holds exactly in the output
    assert got["intersection"].estimate == pytest.approx(
        got["a"].estimate + got["b"].estimate - got["union"].estimate,
        rel=1e-12,
    )
    # every estimate lands within 4 sigma of exact
    for op in ("a", "b", "union"):
        assert abs(got[op].rel_err) < 4 * 1.04 / (HLL_M ** 0.5)


def test_hll_set_ops_disjoint_sets(spark):
    a = spark.range(0, 2000).select(F.col("id").alias("k"))
    b = spark.range(10_000, 12_000).select(F.col("id").alias("k"))
    got = {r.set_op: r for r in hll_set_ops(a, b, col_a="k", col_b="k").collect()}
    assert got["intersection"].exact == 0
    assert got["intersection"].rel_err is None  # NULL by contract
    # disjoint: intersection estimate is inclusion-exclusion noise near 0
    assert abs(got["intersection"].estimate) < 0.2 * 2000


def test_histogram_quantiles_uniform_data(spark):
    """0..9999 uniform: estimates must land within one bin width of
    the exact rank statistics."""
    df = spark.range(10_000).select(F.col("id").cast("double").alias("x"))
    rows = {r.q_ppm: r for r in histogram_quantiles(df, "x").collect()}
    assert set(rows) == {500_000, 900_000, 990_000}
    binw = 9999.0 / 1024
    for q, r in rows.items():
        assert r.n_rows == 10_000
        assert r.target_rank == (q * 10_000 + 999_999) // 1_000_000
        assert r.exact == float(r.target_rank - 1)  # k-th smallest of 0..9999
        assert r.abs_err <= binw + 1e-9
    with pytest.raises(ValueError):
        histogram_quantiles(df, "x", quantiles_ppm=())
    with pytest.raises(ValueError):
        histogram_quantiles(df, "x", bins=1)


def test_histogram_quantiles_constant_column(spark):
    df = spark.range(100).select(F.lit(7.5).alias("x"))
    r = histogram_quantiles(df, "x", quantiles_ppm=(500_000,)).collect()[0]
    assert r.estimate == 7.5 and r.exact == 7.5 and r.abs_err == 0.0


def test_survival_curve_hand_traced(spark):
    """4 units, horizon day 4: lifetimes 0 (death), 2 (death), 4
    (censored, ends at horizon), 4 (censored). KM:
      t=0: n=4, d=1 -> S = 3/4
      t=2: n=3, d=1 -> S = 3/4 * 2/3 = 1/2
      t=4: n=2, d=0 (censored only) -> S stays 1/2
    """
    rows = []
    for u, (start, end) in enumerate(
        [(1, 1), (1, 3), (1, 5), (1, 5)], start=1
    ):
        rows.append((u, dt.datetime(2024, 1, start, 12)))
        rows.append((u, dt.datetime(2024, 1, end, 12)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r.t: r for r in survival_curve(df).collect()}
    assert set(got) == {0, 2, 4}
    assert (got[0].n_at_risk, got[0].n_deaths, got[0].n_censored) == (4, 1, 0)
    assert got[0].survival_fx == KM_SCALE * 3 // 4
    assert (got[2].n_at_risk, got[2].n_deaths) == (3, 1)
    # floor-fold: (3/4 * 2/3) in fx = ((S0 * 2) div 3)
    assert got[2].survival_fx == (KM_SCALE * 3 // 4) * 2 // 3
    assert (got[4].n_at_risk, got[4].n_deaths, got[4].n_censored) == (2, 0, 2)
    assert got[4].survival_fx == got[2].survival_fx  # censoring: no drop
    assert got[4].survival == pytest.approx(0.5, abs=1e-6)


def test_survival_curve_excludes_null_ts_and_units(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1)),
        (1, dt.datetime(2024, 1, 3)),
        (2, dt.datetime(2024, 1, 3)),
        (None, dt.datetime(2024, 1, 2)),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = survival_curve(df).collect()
    # units 1 (lifetime 2, censored at horizon) and 2 (lifetime 0,
    # censored — its last day IS the horizon)
    assert sum(r.n_deaths + r.n_censored for r in got) == 2


def test_active_user_windows_hand_traced(spark):
    """Unit A active days 1,3; unit B day 3. window=2:
      day1: DAU {A}=1, WAU(day0..1)={A}=1
      day2: DAU 0 (no activity) but WAU(day1..2)={A}=1 -> stickiness 0
      day3: DAU {A,B}=2, WAU(day2..3)={A,B}=2
    EVERY day in [min, max] emits a row — the zero-DAU day included.
    """
    from kinesis_stream_spark.operators.temporal import active_user_windows

    rows = [
        ("A", dt.datetime(2024, 1, 1, 5)),
        ("A", dt.datetime(2024, 1, 3, 5)),
        ("B", dt.datetime(2024, 1, 3, 9)),
        (None, dt.datetime(2024, 1, 2, 1)),
        ("C", None),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {r.day: r for r in active_user_windows(df, window_days=2).collect()}
    days = sorted(got)
    assert len(days) == 3
    d1, d2, d3 = days
    assert (d2 - d1, d3 - d1) == (1, 2)
    assert (got[d1].dau, got[d1].wau) == (1, 1)
    assert (got[d2].dau, got[d2].wau) == (0, 1)
    assert got[d2].stickiness_ppm == 0
    assert (got[d3].dau, got[d3].wau) == (2, 2)
    assert got[d1].stickiness_ppm == 1_000_000
    import pytest as _pytest

    with _pytest.raises(ValueError):
        active_user_windows(df, window_days=0)


def test_active_user_windows_silent_window_null_stickiness(spark):
    """A gap longer than the window: the silent day carries WAU = 0
    and NULL stickiness (not a crash, not a dropped row)."""
    from kinesis_stream_spark.operators.temporal import active_user_windows

    rows = [
        ("A", dt.datetime(2024, 1, 1, 5)),
        ("A", dt.datetime(2024, 1, 4, 5)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {r.day: r for r in active_user_windows(df, window_days=1).collect()}
    days = sorted(got)
    assert len(days) == 4  # full grid
    mid = days[1]
    assert (got[mid].dau, got[mid].wau) == (0, 0)
    assert got[mid].stickiness_ppm is None


def test_active_user_windows_wau_is_trailing(spark):
    """Unit active ONLY on day 1 must appear in day-2's WAU (trailing
    window) but not in day-2's DAU; day 2 has its own active unit so
    the day-2 row exists."""
    from kinesis_stream_spark.operators.temporal import active_user_windows

    rows = [
        ("A", dt.datetime(2024, 1, 1, 5)),
        ("B", dt.datetime(2024, 1, 2, 5)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = sorted(active_user_windows(df, window_days=7).collect(), key=lambda r: r.day)
    assert (got[0].dau, got[0].wau) == (1, 1)
    assert (got[1].dau, got[1].wau) == (1, 2)  # A still in the window
    assert got[1].stickiness_ppm == 500_000


def test_benford_audit_shares_and_expectations(spark):
    from kinesis_stream_spark.operators.profile import BENFORD_PPM, benford_audit

    # 60 values leading with 1 (1.00..), 40 leading with 9 (9.xx)
    rows = [(1.0,)] * 60 + [(9.5,)] * 40 + [(None,), (0.0,), (-3.0,)]
    df = spark.createDataFrame(rows, "x double")
    got = {r.digit: r for r in benford_audit(df, "x").collect()}
    assert set(got) == {1, 9}
    assert got[1].n_obs == 60 and got[1].share_ppm == 600_000
    assert got[9].n_obs == 40 and got[9].share_ppm == 400_000
    assert got[1].benford_ppm == BENFORD_PPM[0]
    assert got[9].benford_ppm == BENFORD_PPM[8]
    assert got[1].excess_ppm == 600_000 - BENFORD_PPM[0]
    # Benford ppm table sums to ~1e6 (floor rounding loses < 9 ppm)
    assert 1_000_000 - 9 <= sum(BENFORD_PPM) <= 1_000_000


def test_benford_audit_subcent_values_excluded(spark):
    """0 < x < 0.005 quantizes to 0 cents (leading digit '0', no
    Benford expectation): excluded, never an INVALID_INDEX_OF_ZERO."""
    from kinesis_stream_spark.operators.profile import benford_audit

    rows = [(0.004,), (1.0,), (2.5,)]
    df = spark.createDataFrame(rows, "x double")
    got = {r.digit: r.n_obs for r in benford_audit(df, "x").collect()}
    assert got == {1: 1, 2: 1}
