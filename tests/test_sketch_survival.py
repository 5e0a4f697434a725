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
