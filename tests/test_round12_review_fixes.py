"""Regression guards for the round-12 end-of-session review findings:
the reconciliation CHILD-SUM overflow (per-row clamps don't bound the
aggregate), calibration bin labels at n_bins > 10 (fixed 1-decimal
formatting collided bins and split engines on rounding), and the
roc-auc u2 output saturation."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest


class TestReconciliationChildSumClamp:
    def test_many_subcap_children_clamp_not_crash(self, spark):
        """Reproduces the r12 review finding: 10 children of 1.0e12
        each are all below FX_V_CAP (no row clamp fires) but their fx
        sum ≈ 1.05e19 > 2^63 — pre-fix both engines crashed on the
        BIGINT cast. Post-fix the aggregate clamps onto the same
        ±2^60 grid point an out-of-range stored total lands on."""
        from kinesis_stream_spark.operators.profile import (
            _FX_GRID_CAP,
            sql_total_reconciliation,
            total_reconciliation,
        )

        parent = [(1, 4.0e13)]  # stored total beyond the value cap
        children = [(1, 1.0e12)] * 10  # each below cap; sum overflows
        psdf = spark.createDataFrame(parent, "pk bigint, total double")
        csdf = spark.createDataFrame(children, "ck bigint, contrib double")
        got = total_reconciliation(
            psdf,
            csdf,
            parent_key="pk",
            total_col="total",
            child_key="ck",
            contribution_col="contrib",
        ).collect()
        assert len(got) == 1
        row = got[0]
        # both sides hit the clamp -> reported as 'saturated', never
        # a vacuous 'match' of two capped values (second-review fix)
        assert row.bucket == "saturated" and row.n_keys == 1
        assert row.max_abs_diff_fx == 0

        con = duckdb.connect()
        con.register("pt", pd.DataFrame(parent, columns=["pk", "total"]))
        con.register(
            "ct", pd.DataFrame(children, columns=["ck", "contrib"])
        )
        o = con.execute(
            sql_total_reconciliation(
                parent_table="pt",
                child_table="ct",
                parent_key="pk",
                total_col="total",
                child_key="ck",
                contribution_expr="contrib",
            )
        ).fetchall()
        assert o == [("saturated", 1, 0, 0)]
        assert _FX_GRID_CAP == (1 << 60)

    def test_negative_aggregate_clamps_symmetrically(self, spark):
        from kinesis_stream_spark.operators.profile import (
            total_reconciliation,
        )

        parent = [(1, -4.0e13)]
        children = [(1, -1.0e12)] * 10
        psdf = spark.createDataFrame(parent, "pk bigint, total double")
        csdf = spark.createDataFrame(children, "ck bigint, contrib double")
        got = total_reconciliation(
            psdf,
            csdf,
            parent_key="pk",
            total_col="total",
            child_key="ck",
            contribution_col="contrib",
        ).collect()
        assert [(r.bucket, r.max_abs_diff_fx) for r in got] == [("saturated", 0)]


class TestCalibrationLabelPrecision:
    def test_twenty_bins_have_distinct_labels_both_engines(self, spark):
        """Reproduces the r12 review finding: at B=20 the old
        1-decimal labels collided bins 1 and 2 onto '[0.1,0.1)' and
        the engines' float formatters disagreed on edge rounding.
        Post-fix labels come from integer arithmetic with ⌈log10 B⌉
        digits."""
        from kinesis_stream_spark.operators.modeleval import (
            calibration_bins,
            sql_calibration_bins,
        )

        rows = [(1, 0.06), (0, 0.11), (1, 0.13), (0, 0.16)]
        sdf = spark.createDataFrame(rows, "y int, p double")
        got = [
            (r.bin_label, r.n, r.n_pos, r.mean_pred, r.frac_pos, r.abs_gap)
            for r in calibration_bins(
                sdf, label_col="y", pred_col="p", n_bins=20
            ).collect()
        ]
        labels = [g[0] for g in got]
        assert len(labels) == len(set(labels))  # no collisions
        assert "[0.05,0.10)" in labels and "[0.10,0.15)" in labels
        con = duckdb.connect()
        con.register("t", pd.DataFrame(rows, columns=["y", "p"]))
        want = con.execute(
            sql_calibration_bins(
                table="t", label_col="y", pred_col="p", n_bins=20
            )
        ).fetchall()
        assert got == [tuple(w) for w in want]

    @pytest.mark.parametrize("b", [2, 3, 7, 10, 30, 40, 100])
    def test_labels_distinct_and_cross_engine_at_any_b(self, spark, b):
        from kinesis_stream_spark.operators.modeleval import (
            calibration_bins,
            sql_calibration_bins,
        )

        # one row per bin so every label materializes
        rows = [(i % 2, (i + 0.5) / b) for i in range(b)]
        sdf = spark.createDataFrame(rows, "y int, p double")
        got = [
            r.bin_label
            for r in calibration_bins(
                sdf, label_col="y", pred_col="p", n_bins=b
            ).collect()
        ]
        assert len(got) == len(set(got)) == b + 1  # b bins + __total__
        con = duckdb.connect()
        con.register("t", pd.DataFrame(rows, columns=["y", "p"]))
        want = [
            w[0]
            for w in con.execute(
                sql_calibration_bins(
                    table="t", label_col="y", pred_col="p", n_bins=b
                )
            ).fetchall()
        ]
        assert got == want


class TestRocAucU2Saturation:
    def test_u2_column_is_least_clamped_in_both_plans(self, spark):
        """2U > 2^63 needs n_pos·n_neg > 2^62 — unreachable in a unit
        test, so pin the guard structurally: the Spark plan carries
        the LEAST clamp and the oracle SQL spells the same literal."""
        from kinesis_stream_spark.operators.modeleval import (
            roc_auc_per_class,
            sql_roc_auc_per_class,
        )

        sdf = spark.createDataFrame(
            [("a", 1.0), ("b", 2.0)], "label string, score double"
        )
        plan = (
            roc_auc_per_class(sdf, label_col="label", score_col="score")
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "9223372036854775807" in plan and "least" in plan.lower()
        sql = sql_roc_auc_per_class(
            table="t", label_col="label", score_col="score"
        )
        assert "LEAST(_u2, CAST(9223372036854775807 AS HUGEINT))" in sql
