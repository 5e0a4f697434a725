"""Regression guards for the ADVICE-r10 fixes: floor-safe hellinger
midpoint (pre-epoch timestamps), join-cardinality BIGINT saturation,
the sampler weight ceiling, and scorecard literal escaping. Each test
exercises the divergence the advice described, on BOTH engines where
the fix is cross-engine."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest


class TestHellingerPreEpochMidpoint:
    """min + (max-min) div 2 vs (min+max) div 2: for a negative
    min+max sum Spark `div` (truncates) and DuckDB `//` (floors)
    disagree by 1µs on the old form; the new form's dividend is a
    non-negative span, so the engines agree — and a boundary event
    can no longer flip halves between them."""

    def _rows(self):
        epoch = dt.datetime(1970, 1, 1)
        us = lambda n: epoch + dt.timedelta(microseconds=n)  # noqa: E731
        # span -3µs .. +2µs -> mid = -3 + (2-(-3))//2 = -1 on both
        # engines (old form: Spark 0, DuckDB -1 -> the -1µs event
        # flipped halves). Event at exactly -1µs is the boundary.
        return [
            ("k", us(-3), 10.0),
            ("k", us(-1), 10.0),   # boundary: early iff mid == -1
            ("k", us(0), 400.0),
            ("k", us(2), 400.0),
        ]

    def test_spark_and_duckdb_agree_pre_epoch(self, spark):
        from kinesis_stream_spark.operators.profile import (
            hellinger_drift,
            sql_hellinger_drift,
        )

        rows = self._rows()
        sdf = spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        )
        got = hellinger_drift(sdf).collect()
        assert len(got) == 1
        s = got[0]
        # mid = -1µs: events at -3 and -1 are early, 0 and 2 late
        assert (s.n_early, s.n_late) == (2, 2)

        con = duckdb.connect()
        con.register(
            "events_t",
            pd.DataFrame(rows, columns=["event_type", "ts", "value"]),
        )
        o = con.execute(
            sql_hellinger_drift(table="events_t")
        ).fetchall()
        assert len(o) == 1
        key, n_early, n_late, bc_fx, hell = o[0]
        assert (n_early, n_late) == (s.n_early, s.n_late)
        assert bc_fx == s.bc_fx
        assert hell == pytest.approx(s.hellinger, abs=0)


class TestJoinCardinalitySaturation:
    """join_rows saturates at BIGINT max identically on both engines
    (Spark's non-ANSI DECIMAL→BIGINT cast would NULL, DuckDB's
    HUGEINT→BIGINT cast would raise). Row counts that large can't be
    synthesized, so the clamp FORM is pinned at the expression level
    with the operators' exact types."""

    BIG = 2 * 10**19  # > 2^63-1

    def test_clamp_form_agrees_cross_engine(self, spark):
        spark_val = spark.sql(
            f"SELECT CAST(LEAST(CAST({self.BIG} AS DECIMAL(38,0)),"
            f" CAST({2**63 - 1} AS DECIMAL(38,0))) AS BIGINT) AS j"
        ).collect()[0].j
        duck_val = duckdb.sql(
            f"SELECT CAST(LEAST(CAST({self.BIG} AS HUGEINT),"
            f" CAST(9223372036854775807 AS HUGEINT)) AS BIGINT) AS j"
        ).fetchall()[0][0]
        assert spark_val == duck_val == 2**63 - 1

    def test_small_profiles_unchanged(self, spark):
        from kinesis_stream_spark.operators.skew import (
            join_cardinality_profile,
        )

        left = spark.createDataFrame(
            [(1,), (1,), (2,)], "k long"
        )
        right = spark.createDataFrame([(1,), (2,), (2,)], "k long")
        rows = {
            r.key: r for r in join_cardinality_profile(
                left, right, left_key="k", right_key="k"
            ).collect()
        }
        assert rows["__total__"].join_rows == 2 * 1 + 1 * 2
        assert rows["1"].join_rows == 2 and rows["2"].join_rows == 2


class TestSamplerWeightCeiling:
    def test_huge_weight_same_rows_both_engines(self, spark):
        from kinesis_stream_spark.operators.sampling import (
            W_MAX,
            weighted_priority_sample,
            sql_weighted_priority_sample,
        )

        rows = [
            ("g", 1, 1e15),   # far past the ceiling -> clamps to 2^40
            ("g", 2, 5.0),
            ("g", 3, 1e15),
            ("g", 4, 0.25),
        ]
        sdf = spark.createDataFrame(rows, "grp string, id long, w double")
        got = sorted(
            (r.id, r.weight_fx, r.sample_rank)
            for r in weighted_priority_sample(
                sdf, group_col="grp", id_col="id", weight_col="w", k=3
            ).collect()
        )
        # clamped fx = floor(2^40 * 2^20) = 2^60 — inside BIGINT
        assert all(
            fx == 1 << 60 for i, fx, _ in got if i in (1, 3)
        )
        con = duckdb.connect()
        con.register(
            "t", pd.DataFrame(rows, columns=["grp", "id", "w"])
        )
        oracle = sorted(
            (i, fx, rk)
            for _, i, fx, rk in con.execute(
                sql_weighted_priority_sample(
                    table="t", group_col="grp", id_col="id",
                    weight_col="w", k=3,
                )
            ).fetchall()
        )
        assert got == oracle
        assert W_MAX == float(1 << 40)


class TestScorecardLiteralEscaping:
    def test_quoted_name_and_values_both_engines(self, spark):
        from kinesis_stream_spark.operators.profile import (
            quality_scorecard,
            sql_quality_scorecard,
        )

        rows = [("it's ok",), ("bad",), (None,)]
        sdf = spark.createDataFrame(rows, "status string")
        constraints = [
            {
                "name": "status's set",
                "kind": "in_set",
                "col": "status",
                "values": ["it's ok", "fine"],
            },
            {"name": "no\\nulls", "kind": "not_null", "col": "status"},
        ]
        got = {
            r.check_name: (r.n_rows, r.n_violations, r.passed)
            for r in quality_scorecard(sdf, constraints).collect()
        }
        # 'bad' and NULL violate in_set; NULL violates not_null
        assert got["status's set"] == (3, 2, False)
        assert got["no\\nulls"] == (3, 1, False)

        con = duckdb.connect()
        con.register("t", pd.DataFrame(rows, columns=["status"]))
        oracle = {
            name: (n, v, p)
            for name, n, v, _ppm, p in con.execute(
                sql_quality_scorecard(table="t", constraints=constraints)
            ).fetchall()
        }
        assert oracle == got
