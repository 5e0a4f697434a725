"""Unit tests for the sample-ratio-mismatch check — hand-computed χ²,
the unit-not-event contract, empty input, partition invariance."""

from __future__ import annotations

import pytest


def _ev(spark, uids):
    return spark.createDataFrame(
        [(u,) for u in uids], "user_id long"
    )


def _variant(uid):
    import hashlib

    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2


def _run(spark, uids):
    from kinesis_stream_spark.operators.experiment import ab_srm_check

    rows = ab_srm_check(_ev(spark, uids)).collect()
    assert len(rows) == 1
    return rows[0]


class TestHandComputed:
    def test_chi2_matches_python(self, spark):
        uids = list(range(40))
        got = _run(spark, uids)
        n_t = sum(_variant(u) for u in set(uids))
        n_c = len(set(uids)) - n_t
        assert (got.n_control, got.n_treatment) == (n_c, n_t)
        assert got.n_units == 40
        assert got.imbalance_ppm == abs(n_c - n_t) * 1_000_000 // 40
        assert got.chi2_stat == pytest.approx(
            (n_c - n_t) ** 2 / 40, abs=0
        )
        assert got.srm_detected == (got.chi2_stat > 3.841)

    def test_units_not_events(self, spark):
        # one user appearing 1000x must count ONCE
        got = _run(spark, [7] * 1000 + [8])
        assert got.n_units == 2

    def test_gross_mismatch_flags(self, spark):
        # construct all-one-arm ids: filter by hash parity
        uids = [u for u in range(400) if _variant(u) == 0][:30]
        got = _run(spark, uids)
        assert got.n_treatment == 0 and got.n_control == 30
        assert got.chi2_stat == 30.0
        assert bool(got.srm_detected) is True
        assert got.imbalance_ppm == 1_000_000

    def test_empty_nulls(self, spark):
        got = _run(spark, [])
        assert (got.n_control, got.n_treatment, got.n_units) == (0, 0, 0)
        assert got.chi2_stat is None and got.srm_detected is None
        assert got.imbalance_ppm is None

    def test_null_units_excluded(self, spark):
        from kinesis_stream_spark.operators.experiment import ab_srm_check

        df = spark.createDataFrame([(1,), (None,)], "user_id long")
        assert ab_srm_check(df).collect()[0].n_units == 1

    def test_partition_invariance(self, spark):
        from kinesis_stream_spark.operators.experiment import ab_srm_check

        base = str(_run(spark, list(range(100))))
        re9 = str(
            ab_srm_check(_ev(spark, list(range(100))).repartition(9))
            .collect()[0]
        )
        assert re9 == base
