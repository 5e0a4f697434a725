"""Hand-computed math and degenerate-input contracts for the second
round-9 operator batch (Cramér's V, HITS, salted join, compaction
planner, rolling regression, silhouette)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _rows(pairs):
    return [p for p, n in pairs for _ in range(n)]


class TestCramersV:
    def test_hand_computed_2x2(self, spark):
        from kinesis_stream_spark.operators.profile import (
            CRAMER_SCALE,
            cramers_v,
        )

        data = _rows(
            [(("a", "u"), 4), (("a", "v"), 1), (("b", "u"), 1), (("b", "v"), 4)]
        )
        df = spark.createDataFrame(data, "x: string, y: string")
        row = cramers_v(df, "x", "y").collect()[0]
        # every cell: exp = 2.5, contrib = 0.9 -> term_fx = floor(0.9 * 2^20)
        term = math.floor(0.9 * CRAMER_SCALE)
        assert row["n_rows"] == 10
        assert row["n_cells"] == 4
        assert (row["r_levels"], row["c_levels"], row["dof"]) == (2, 2, 1)
        assert row["chi2_fx"] == 4 * term
        chi2 = 4 * term / CRAMER_SCALE
        assert row["chi2"] == chi2
        assert row["cramers_v"] == math.sqrt(chi2 / 10.0)

    def test_constant_column_yields_null_v(self, spark):
        from kinesis_stream_spark.operators.profile import cramers_v

        df = spark.createDataFrame(
            [("a", "u"), ("a", "v"), ("a", "u")], "x: string, y: string"
        )
        row = cramers_v(df, "x", "y").collect()[0]
        assert row["r_levels"] == 1
        assert row["dof"] == 0
        assert row["cramers_v"] is None

    def test_null_category_counts_as_level(self, spark):
        from kinesis_stream_spark.operators.profile import cramers_v

        df = spark.createDataFrame(
            [("a", "u"), ("a", None), ("b", "u"), ("b", None)],
            "x: string, y: string",
        )
        row = cramers_v(df, "x", "y").collect()[0]
        # NULL y forms its own level: perfectly independent 2x2
        assert row["c_levels"] == 2
        assert row["chi2_fx"] == 0
        assert row["cramers_v"] == 0.0

    def test_perfect_association_is_one(self, spark):
        from kinesis_stream_spark.operators.profile import cramers_v

        data = _rows([(("a", "u"), 5), (("b", "v"), 5)])
        df = spark.createDataFrame(data, "x: string, y: string")
        row = cramers_v(df, "x", "y").collect()[0]
        # chi2 = N exactly -> V = 1 (up to the 2^-20 quantization)
        assert abs(row["cramers_v"] - 1.0) < 1e-5
