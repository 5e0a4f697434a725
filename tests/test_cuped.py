"""Unit tests for the CUPED operator — replayed against a plain-python
reference on the same md5 split, plus the degenerate contracts (no
covariate signal -> theta 0, tiny arms -> NULL z, empty input)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest

FX = 1 << 20
SPLIT = dt.datetime(2024, 1, 11)
SPLIT_US = 1_704_931_200_000_000  # 2024-01-11 00:00 UTC (TZ-independent)


def _variant(uid):
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )


def _python_cuped(rows):
    per = {}
    for uid, ts, v in rows:
        if uid is None or ts is None:
            continue
        x, y = per.setdefault(uid, [0.0, 0.0])
        if ts < SPLIT:
            per[uid][0] += v or 0.0
        else:
            per[uid][1] += v or 0.0
    units = [
        (_variant(u), math.floor(x * FX), math.floor(y * FX))
        for u, (x, y) in per.items()
    ]
    n = len(units)
    sx = sum(x for _, x, _ in units)
    sy = sum(y for _, _, y in units)
    sxy = sum(x * y for _, x, y in units)
    sxx = sum(x * x for _, x, _ in units)
    sxx_p = n * sxx - sx * sx
    sxy_p = n * sxy - sx * sy
    theta = float(sxy_p) / float(sxx_p) if sxx_p > 0 else 0.0
    xbar = float(sx) / n
    out = {}
    for v in (0, 1):
        arm = [(x, y) for a, x, y in units if a == v]
        na = len(arm)
        sya = sum(y for _, y in arm)
        sxa = sum(x for x, _ in arm)
        mcv = float(sya) / na - theta * (float(sxa) / na - xbar)
        syya = sum(y * y for _, y in arm)
        sxya = sum(x * y for x, y in arm)
        sxxa = sum(x * x for x, _ in arm)
        scv = (
            float(na * syya - sya * sya)
            - 2.0 * theta * float(na * sxya - sxa * sya)
            + theta * theta * float(na * sxxa - sxa * sxa)
        )
        vcv = scv / (na * (na - 1.0)) if na > 1 else None
        out[v] = (na, mcv, vcv)
    return theta, out


class TestMatchesPython:
    def _rows(self):
        rows = []
        for uid in range(24):
            # pre-period spend correlated with post-period spend
            base = (uid * 7) % 13 + 1.0
            rows.append((uid, dt.datetime(2024, 1, 3, uid % 20), base * 2))
            rows.append(
                (uid, dt.datetime(2024, 1, 20, uid % 20), base * 3 + uid % 5)
            )
        return rows

    def test_theta_means_z(self, spark):
        from kinesis_stream_spark.operators.experiment import ab_cuped

        rows = self._rows()
        got = ab_cuped(_ev(spark, rows), split_us=SPLIT_US).collect()[0]
        theta, arms = _python_cuped(rows)
        (n_c, mcv_c, vcv_c), (n_t, mcv_t, vcv_t) = arms[0], arms[1]
        assert (got.n_control, got.n_treatment) == (n_c, n_t)
        assert got.theta == pytest.approx(theta, rel=1e-12)
        assert got.mean_control_cv == pytest.approx(mcv_c / FX, rel=1e-12)
        assert got.mean_treatment_cv == pytest.approx(mcv_t / FX, rel=1e-12)
        z = (mcv_t - mcv_c) / math.sqrt(vcv_c / n_c + vcv_t / n_t)
        assert got.z_stat == pytest.approx(z, rel=1e-12)

    def test_variance_reduction_bounds(self, spark):
        """With a genuinely correlated covariate the ratio must come
        out below 10^6 (CUPED can only help at the optimum theta)."""
        from kinesis_stream_spark.operators.experiment import ab_cuped

        got = ab_cuped(
            _ev(spark, self._rows()), split_us=SPLIT_US
        ).collect()[0]
        assert got.var_reduction_ppm is not None
        assert 0 <= got.var_reduction_ppm <= 1_000_000


class TestContracts:
    def test_no_covariate_signal_theta_zero(self, spark):
        from kinesis_stream_spark.operators.experiment import ab_cuped

        # nobody has pre-period activity -> var(X)=0 -> theta 0
        rows = [
            (u, dt.datetime(2024, 1, 20), float(u % 7)) for u in range(12)
        ]
        got = ab_cuped(_ev(spark, rows), split_us=SPLIT_US).collect()[0]
        assert got.theta == 0.0
        assert got.z_stat is not None  # degenerates to the plain diff z

    def test_single_unit_arm_null_z(self, spark):
        from kinesis_stream_spark.operators.experiment import ab_cuped

        arm0 = [u for u in range(50) if _variant(u) == 0]
        arm1 = [u for u in range(50) if _variant(u) == 1]
        uids = arm0[:3] + arm1[:1]
        rows = [(u, dt.datetime(2024, 1, 20), 1.0 * u) for u in uids]
        got = ab_cuped(_ev(spark, rows), split_us=SPLIT_US).collect()[0]
        assert got.z_stat is None

    def test_empty_one_row_nulls(self, spark):
        from kinesis_stream_spark.operators.experiment import ab_cuped

        got = ab_cuped(_ev(spark, []), split_us=SPLIT_US).collect()
        assert len(got) == 1
        assert (got[0].n_control, got[0].n_treatment) == (0, 0)
        assert got[0].z_stat is None

    def test_partition_invariance(self, spark):
        from kinesis_stream_spark.operators.experiment import ab_cuped

        rows = [
            (u, dt.datetime(2024, 1, 3 + (u % 20)), float((u * 11) % 23))
            for u in range(40)
        ]
        base = str(ab_cuped(_ev(spark, rows), split_us=SPLIT_US).collect())
        re9 = str(
            ab_cuped(
                _ev(spark, rows).repartition(9), split_us=SPLIT_US
            ).collect()
        )
        assert re9 == base
