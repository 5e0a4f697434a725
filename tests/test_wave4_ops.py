"""Unit tests for the round-9 wave-4 operators: session stats, label
inertia, reciprocity. Cross-engine parity rides
tests/test_oracle_parity.py; these pin the math and the contracts.
"""

from __future__ import annotations

import datetime

import pytest


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )


def _t(day, minute):
    return datetime.datetime(2024, 1, day, minute // 60, minute % 60)


class TestSessionStats:
    def test_gap_splits_and_bounce_math(self, spark):
        from kinesis_stream_spark.operators.temporal import session_stats

        rows = [
            # user 1, day 1: events at 0 and 10 min (one session),
            # then at 60 min (> 30-min gap -> new session, a bounce)
            (1, _t(1, 0), 1, "a", 0.0),
            (2, _t(1, 10), 1, "a", 0.0),
            (3, _t(1, 60), 1, "a", 0.0),
            # user 2, day 1: single event -> bounce
            (4, _t(1, 5), 2, "a", 0.0),
        ]
        out = session_stats(_ev(spark, rows)).collect()
        assert len(out) == 1
        r = out[0]
        assert r["n_sessions"] == 3
        assert r["n_bounces"] == 2
        assert r["bounce_ppm"] == 666_666
        assert r["n_events"] == 4
        assert r["events_per_session_milli"] == 1_333
        assert r["total_duration_us"] == 10 * 60 * 1_000_000

    def test_users_never_share_sessions(self, spark):
        from kinesis_stream_spark.operators.temporal import session_stats

        rows = [
            (1, _t(1, 0), 1, "a", 0.0),
            (2, _t(1, 1), 2, "a", 0.0),
        ]
        out = session_stats(_ev(spark, rows)).collect()[0]
        assert out["n_sessions"] == 2 and out["n_bounces"] == 2

    def test_null_user_and_ts_excluded(self, spark):
        from kinesis_stream_spark.operators.temporal import session_stats

        rows = [
            (1, _t(1, 0), 1, "a", 0.0),
            (2, _t(1, 1), None, "a", 0.0),
            (3, None, 1, "a", 0.0),
        ]
        out = session_stats(_ev(spark, rows)).collect()[0]
        assert out["n_events"] == 1

    def test_empty(self, spark):
        from kinesis_stream_spark.operators.temporal import session_stats

        assert session_stats(_ev(spark, [])).count() == 0


class TestLabelInertia:
    def _emb(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>"
        )

    def test_hand_computed_sse(self, spark):
        from kinesis_stream_spark.operators.evaluation import label_inertia

        # label 0: vectors (0, 0) and (2, 0): centroid (1, 0),
        # inertia = 1 + 1 = 2. label 1: single vector -> inertia 0.
        rows = [
            (1, 0, [0.0, 0.0]),
            (2, 0, [2.0, 0.0]),
            (3, 1, [5.0, 5.0]),
        ]
        out = {
            r["label_key"]: r
            for r in label_inertia(self._emb(spark, rows)).collect()
        }
        assert out["0"]["n_vectors"] == 2
        assert out["0"]["inertia"] == pytest.approx(2.0, abs=1e-9)
        assert out["1"]["inertia"] == pytest.approx(0.0, abs=1e-9)
        # grand row: ANOVA identity — within (2) + between > total? No:
        # total SSE around the grand centroid ≥ Σ within
        assert out["__all__"]["n_vectors"] == 3
        assert out["__all__"]["inertia"] > 2.0

    def test_anova_identity(self, spark):
        from kinesis_stream_spark.operators.evaluation import label_inertia

        rows = [
            (1, 0, [0.0]), (2, 0, [2.0]),
            (3, 1, [10.0]), (4, 1, [12.0]),
        ]
        out = {
            r["label_key"]: r
            for r in label_inertia(self._emb(spark, rows)).collect()
        }
        within = out["0"]["inertia"] + out["1"]["inertia"]
        # between = Σ n_l·(μ_l − μ)² = 2·5² + 2·5² = 100
        assert out["__all__"]["inertia"] == pytest.approx(
            within + 100.0, abs=1e-6
        )

    def test_null_label_slice(self, spark):
        from kinesis_stream_spark.operators.evaluation import label_inertia

        rows = [(1, None, [1.0]), (2, None, [3.0])]
        out = {
            r["label_key"]: r
            for r in label_inertia(self._emb(spark, rows)).collect()
        }
        assert out["__null__"]["inertia"] == pytest.approx(2.0, abs=1e-9)


class TestReciprocity:
    def _e(self, spark, rows):
        return spark.createDataFrame(rows, "src string, dst string")

    def test_hand_computed(self, spark):
        from kinesis_stream_spark.operators.graph import reciprocity

        # a<->b mutual (2 reciprocated edges), a->c one-way
        out = reciprocity(
            self._e(spark, [("a", "b"), ("b", "a"), ("a", "c")])
        ).collect()[0]
        assert out["n_edges"] == 3
        assert out["n_reciprocated"] == 2
        assert out["reciprocity_ppm"] == 666_666

    def test_self_loops_excluded(self, spark):
        from kinesis_stream_spark.operators.graph import reciprocity

        out = reciprocity(
            self._e(spark, [("a", "a"), ("a", "b")])
        ).collect()[0]
        assert out["n_edges"] == 1 and out["n_reciprocated"] == 0

    def test_empty_graph_null_ratio(self, spark):
        from kinesis_stream_spark.operators.graph import reciprocity

        out = reciprocity(self._e(spark, [])).collect()[0]
        assert out["n_edges"] == 0
        assert out["reciprocity_ppm"] is None
