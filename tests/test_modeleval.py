"""Classifier-eval operators (operators/modeleval.py): hand-computed
ROC-AUC and calibration fixtures, tie/one-sided/empty edges, both
engines, and plan pins (the ×C explode must be a broadcast, the
calibration pass join-free)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kinesis_stream_spark.operators.modeleval import (
    calibration_bins,
    roc_auc_per_class,
    sql_calibration_bins,
    sql_roc_auc_per_class,
)


class TestRocAuc:
    def test_hand_computed_with_ties(self, spark):
        # class 'a' positives scores [1.0, 2.0], negatives (class 'b')
        # [1.0, 0.5]: pairs — (1.0 vs 0.5) win, (1.0 vs 1.0) tie=0.5,
        # (2.0 vs 0.5) win, (2.0 vs 1.0) win -> U = 3.5, AUC = 3.5/4,
        # u2 = 7
        rows = [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 0.5)]
        sdf = spark.createDataFrame(rows, "label string, score double")
        got = {
            r.class_label: r
            for r in roc_auc_per_class(
                sdf, label_col="label", score_col="score"
            ).collect()
        }
        a = got["a"]
        assert (a.n_pos, a.n_neg, a.u2) == (2, 2, 7)
        assert a.auc == pytest.approx(7 / 8, abs=0.0)
        # gini = 2*7/8 - 1 = 0.75 -> 750000 ppm
        assert a.gini_ppm == 750_000
        # class 'b' is the mirror task: u2 = 2*n_pos*n_neg - 7 = 1
        b = got["b"]
        assert (b.u2, b.auc) == (1, pytest.approx(1 / 8, abs=0.0))
        assert b.gini_ppm == -750_000  # truncation agrees cross-engine

    def test_one_sided_class_yields_null(self, spark):
        rows = [("only", 1.0), ("only", 2.0)]
        sdf = spark.createDataFrame(rows, "label string, score double")
        got = roc_auc_per_class(
            sdf, label_col="label", score_col="score"
        ).collect()
        assert len(got) == 1
        assert got[0].n_neg == 0
        assert got[0].auc is None and got[0].gini_ppm is None

    def test_empty_input(self, spark):
        sdf = spark.createDataFrame([], "label string, score double")
        assert (
            roc_auc_per_class(
                sdf, label_col="label", score_col="score"
            ).count()
            == 0
        )

    def test_duckdb_twin_matches(self, spark):
        rows = [
            ("a", 0.25),
            ("a", -1.5),
            ("b", 0.25),
            ("b", 3.0),
            ("c", 0.25),
            ("a", 0.7),
            ("b", -2.0),
        ]
        sdf = spark.createDataFrame(rows, "label string, score double")
        got = [
            (r.class_label, r.n_pos, r.n_neg, r.u2, r.auc, r.gini_ppm)
            for r in roc_auc_per_class(
                sdf, label_col="label", score_col="score"
            ).collect()
        ]
        con = duckdb.connect()
        con.register("t", pd.DataFrame(rows, columns=["label", "score"]))
        want = con.execute(
            sql_roc_auc_per_class(
                table="t", label_col="label", score_col="score"
            )
        ).fetchall()
        assert got == [tuple(w) for w in want]

    @pytest.mark.slow  # invariance dup of the shared fx path (conftest.py)
    def test_partition_invariance(self, spark):
        rows = [(f"c{i % 3}", float((i * 37) % 11) / 7.0) for i in range(60)]
        sdf = spark.createDataFrame(rows, "label string, score double")
        one = roc_auc_per_class(
            sdf.coalesce(1), label_col="label", score_col="score"
        ).collect()
        many = roc_auc_per_class(
            sdf.repartition(13), label_col="label", score_col="score"
        ).collect()
        assert one == many

    def test_plan_only_broadcast_join(self, spark):
        """The ×C one-vs-rest explode must be a broadcast nested loop
        against the tiny class frame — never a shuffled join or an
        unbroadcast cartesian against the corpus."""
        sdf = spark.createDataFrame(
            [("a", 1.0), ("b", 2.0)], "label string, score double"
        )
        plan = (
            roc_auc_per_class(sdf, label_col="label", score_col="score")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan


class TestCalibrationBins:
    def test_hand_computed_ece(self, spark):
        # B=2: bin 0 gets p in [0,.5), bin 1 the rest (p=1.0 clamps
        # into bin 1 — the last-bin rule)
        rows = [(1, 0.25), (0, 0.25), (0, 0.0), (1, 0.75), (1, 1.0)]
        sdf = spark.createDataFrame(rows, "y int, p double")
        got = {
            r.bin_label: r
            for r in calibration_bins(
                sdf, label_col="y", pred_col="p", n_bins=2
            ).collect()
        }
        b0 = got["[0.0,0.5)"]
        assert (b0.n, b0.n_pos) == (3, 1)
        assert b0.mean_pred == pytest.approx(0.5 / 3, abs=1e-6)
        assert b0.frac_pos == pytest.approx(1 / 3, abs=0.0)
        assert b0.abs_gap == pytest.approx(1 / 3 - 0.5 / 3, abs=1e-6)
        b1 = got["[0.5,1.0)"]
        assert (b1.n, b1.n_pos) == (2, 2)
        assert b1.mean_pred == pytest.approx(0.875, abs=1e-6)
        assert b1.frac_pos == pytest.approx(1.0, abs=0.0)
        t = got["__total__"]
        assert (t.n, t.n_pos) == (5, 3)
        # ece = (3/5)*gap0 + (2/5)*gap1
        assert t.abs_gap == pytest.approx(
            (3 / 5) * b0.abs_gap + (2 / 5) * b1.abs_gap, abs=1e-6
        )

    def test_out_of_range_predictions_clamp(self, spark):
        rows = [(1, 1.7), (0, -0.3)]
        sdf = spark.createDataFrame(rows, "y int, p double")
        got = {
            r.bin_label: r
            for r in calibration_bins(
                sdf, label_col="y", pred_col="p", n_bins=10
            ).collect()
        }
        assert got["[0.9,1.0)"].mean_pred == pytest.approx(1.0, abs=0.0)
        assert got["[0.0,0.1)"].mean_pred == pytest.approx(0.0, abs=0.0)

    def test_empty_input_total_row_only(self, spark):
        sdf = spark.createDataFrame([], "y int, p double")
        got = calibration_bins(
            sdf, label_col="y", pred_col="p", n_bins=10
        ).collect()
        assert len(got) == 1
        t = got[0]
        assert t.bin_label == "__total__" and t.n == 0
        assert t.mean_pred is None and t.abs_gap is None

    def test_duckdb_twin_matches(self, spark):
        rows = [
            (i % 2, ((i * 131) % 97) / 96.0) for i in range(200)
        ] + [(1, 1.0), (0, 0.0)]
        sdf = spark.createDataFrame(rows, "y int, p double")
        got = [
            (r.bin_label, r.n, r.n_pos, r.mean_pred, r.frac_pos, r.abs_gap)
            for r in calibration_bins(
                sdf, label_col="y", pred_col="p", n_bins=10
            ).collect()
        ]
        con = duckdb.connect()
        con.register("t", pd.DataFrame(rows, columns=["y", "p"]))
        want = con.execute(
            sql_calibration_bins(
                table="t", label_col="y", pred_col="p", n_bins=10
            )
        ).fetchall()
        assert got == [tuple(w) for w in want]

    def test_plan_is_join_free(self, spark):
        sdf = spark.createDataFrame([(1, 0.5)], "y int, p double")
        plan = (
            calibration_bins(sdf, label_col="y", pred_col="p", n_bins=10)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for node in ("Join", "CartesianProduct", "Window"):
            assert node not in plan

    def test_plan_scans_corpus_once(self, spark, sf_dir):
        """The '__total__' fold must ride the ≤B-row bin frame, not a
        second corpus branch (r12 plan audit: the union-of-two-
        aggregates form produced TWO FileScans with no reuse)."""
        from kinesis_stream_spark.sources.batch import load_table

        ev = load_table(spark, sf_dir, "events").select(
            (F.col("event_type") == "purchase").cast("int").alias("y"),
            (F.col("value") / (F.col("value") + F.lit(100.0))).alias("p"),
        )
        plan = (
            calibration_bins(ev, label_col="y", pred_col="p", n_bins=10)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("FileScan") == 1

    @pytest.mark.slow  # invariance dup of the shared fx path (conftest.py)
    def test_partition_invariance(self, spark):
        rows = [(i % 2, ((i * 53) % 101) / 100.0) for i in range(300)]
        sdf = spark.createDataFrame(rows, "y int, p double")
        one = calibration_bins(
            sdf.coalesce(1), label_col="y", pred_col="p"
        ).collect()
        many = calibration_bins(
            sdf.repartition(17), label_col="y", pred_col="p"
        ).collect()
        assert one == many
