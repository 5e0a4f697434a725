"""Unit tests for the round-9 wave-3 operators: anomaly episodes,
cohort LTV, lexical diversity, degree assortativity, PRF expansion —
hand-computed fixtures and degenerate inputs. Cross-engine parity is
covered by tests/test_oracle_parity.py.
"""

from __future__ import annotations

import datetime

import pytest


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )


def _ts(day):
    return datetime.datetime(2024, 1, day)


class TestAnomalyEpisodes:
    def test_consecutive_run_stitches_gap_breaks(self, spark):
        from kinesis_stream_spark.operators.temporal import anomaly_episodes

        # mean ≈ (8·1 + 3·100)/11 = 28: days 5, 6 and 9 flag (>1.5×)
        vals = {1: 1.0, 2: 1.0, 3: 1.0, 4: 1.0, 5: 100.0, 6: 100.0,
                7: 1.0, 8: 1.0, 9: 100.0, 10: 1.0, 11: 1.0}
        rows = [(d, _ts(d), 1, "a", v) for d, v in vals.items()]
        out = anomaly_episodes(_ev(spark, rows)).orderBy(
            "start_bucket"
        ).collect()
        assert len(out) == 2
        d = 86_400_000_000
        day = lambda n: int(_ts(n).timestamp() * 1_000_000) // d
        assert (out[0]["start_bucket"], out[0]["end_bucket"]) == (
            day(5), day(6)
        )
        assert out[0]["n_periods"] == 2
        assert out[0]["peak_value"] == pytest.approx(100.0, abs=1e-4)
        assert (out[1]["start_bucket"], out[1]["end_bucket"]) == (
            day(9), day(9)
        )

    def test_calendar_gap_splits_episode(self, spark):
        from kinesis_stream_spark.operators.temporal import anomaly_episodes

        # hot on days 5 and 7 with NO data on day 6: two episodes
        rows = [(d, _ts(d), 1, "a", 1.0) for d in (1, 2, 3, 4)]
        rows += [(5, _ts(5), 1, "a", 100.0), (7, _ts(7), 1, "a", 100.0)]
        out = anomaly_episodes(_ev(spark, rows)).collect()
        assert len(out) == 2
        assert all(r["n_periods"] == 1 for r in out)

    def test_flat_series_no_episodes(self, spark):
        from kinesis_stream_spark.operators.temporal import anomaly_episodes

        rows = [(d, _ts(d), 1, "a", 5.0) for d in range(1, 8)]
        assert anomaly_episodes(_ev(spark, rows)).count() == 0

    def test_nonpositive_total_flags_nothing(self, spark):
        from kinesis_stream_spark.operators.temporal import anomaly_episodes

        rows = [(d, _ts(d), 1, "a", -5.0) for d in range(1, 5)]
        rows.append((9, _ts(9), 1, "a", 2.0))  # total < 0
        assert anomaly_episodes(_ev(spark, rows)).count() == 0


class TestCohortLtv:
    def test_triangle_hand_computed(self, spark):
        from kinesis_stream_spark.operators.temporal import cohort_ltv

        # user 1 first-buys week of Jan 1 (10.0), buys again 2 weeks
        # later (20.0); user 2 joins week 2 (5.0)
        rows = [
            (1, _ts(1), 1, "purchase", 10.0),
            (2, _ts(15), 1, "purchase", 20.0),
            (3, _ts(8), 2, "purchase", 5.0),
            (4, _ts(8), 2, "view", 999.0),  # not a conversion
        ]
        out = {
            (r["cohort_week"], r["age_weeks"]): r
            for r in cohort_ltv(_ev(spark, rows)).collect()
        }
        w0 = int(_ts(1).timestamp() * 1_000_000) // (7 * 86_400_000_000)
        assert out[(w0, 0)]["revenue_micro"] == 10_000_000
        assert out[(w0, 2)]["revenue_micro"] == 20_000_000
        assert out[(w0, 2)]["cum_revenue_micro"] == 30_000_000
        assert out[(w0 + 1, 0)]["revenue_micro"] == 5_000_000
        assert out[(w0, 0)]["n_active"] == 1

    def test_null_value_keeps_activity(self, spark):
        from kinesis_stream_spark.operators.temporal import cohort_ltv

        rows = [(1, _ts(1), 1, "purchase", None)]
        out = cohort_ltv(_ev(spark, rows)).collect()[0]
        assert out["n_active"] == 1 and out["revenue_micro"] == 0

    def test_empty(self, spark):
        from kinesis_stream_spark.operators.temporal import cohort_ltv

        assert cohort_ltv(_ev(spark, [])).count() == 0


class TestLexicalDiversity:
    def test_hand_computed(self, spark):
        from kinesis_stream_spark.operators.text import lexical_diversity

        docs = spark.createDataFrame(
            [(1, "a a b c"), (2, "x x x x")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r for r in lexical_diversity(docs).collect()
        }
        assert out[1]["n_tokens"] == 4 and out[1]["n_types"] == 3
        assert out[1]["n_hapax"] == 2
        assert out[1]["ttr_ppm"] == 750_000
        assert out[1]["hapax_share_ppm"] == 666_666
        assert out[2]["ttr_ppm"] == 250_000 and out[2]["n_hapax"] == 0

    def test_empty_and_null_docs_absent(self, spark):
        from kinesis_stream_spark.operators.text import lexical_diversity

        docs = spark.createDataFrame(
            [(1, None), (2, ""), (3, "   ")],
            "doc_id long, text string",
        )
        assert lexical_diversity(docs).count() == 0


class TestAssortativity:
    def test_star_graph_is_disassortative(self, spark):
        from kinesis_stream_spark.operators.graph import degree_assortativity

        # two stars wired hub->leaves plus one leaf->leaf edge:
        # hub edges pair (high out, low in) — r < 0
        edges = [("h", f"l{i}") for i in range(6)]
        edges += [("l0", "l1")]
        df = spark.createDataFrame(edges, "src string, dst string")
        out = degree_assortativity(df).collect()[0]
        assert out["n_edges"] == 7
        assert out["r"] is not None and out["r"] < 0

    def test_uniform_degrees_null_r(self, spark):
        from kinesis_stream_spark.operators.graph import degree_assortativity

        # perfect matching: every out-degree 1, every in-degree 1 —
        # zero variance on both axes
        df = spark.createDataFrame(
            [("a", "x"), ("b", "y")], "src string, dst string"
        )
        out = degree_assortativity(df).collect()[0]
        assert out["r"] is None
        assert out["mean_out"] == 1.0 and out["mean_in"] == 1.0

    def test_empty(self, spark):
        from kinesis_stream_spark.operators.graph import degree_assortativity

        df = spark.createDataFrame([], "src string, dst string")
        out = degree_assortativity(df).collect()[0]
        assert out["n_edges"] == 0 and out["r"] is None


class TestPrfExpansion:
    def test_expansion_excludes_query_terms(self, spark):
        from kinesis_stream_spark.operators.retrieval import prf_expansion

        docs = spark.createDataFrame(
            [
                (1, "kinesis shard checkpoint lease"),
                (2, "kinesis shard iterator sequence"),
                (3, "cooking pasta recipe tomato"),
            ],
            "doc_id long, text string",
        )
        q = spark.createDataFrame(
            [(1, "kinesis shard")], "query_id long, qtext string"
        )
        out = prf_expansion(docs, q, m=2, t=10).collect()
        terms = {r["term"] for r in out}
        assert "kinesis" not in terms and "shard" not in terms
        # expansion comes from the two kinesis docs, not the recipe
        assert "checkpoint" in terms and "iterator" in terms
        assert "pasta" not in terms

    def test_rare_terms_outrank_common(self, spark):
        from kinesis_stream_spark.operators.retrieval import prf_expansion

        # "common" appears in every doc (low idf), "rare" only in the
        # retrieved ones (high idf): rare must rank first
        docs = spark.createDataFrame(
            [
                (1, "query rare common"),
                (2, "query rare common"),
                (3, "other text common"),
                (4, "other text common"),
            ],
            "doc_id long, text string",
        )
        q = spark.createDataFrame(
            [(1, "query")], "query_id long, qtext string"
        )
        out = prf_expansion(docs, q, m=2, t=10).collect()
        ranks = {r["term"]: r["rank"] for r in out}
        assert ranks["rare"] < ranks["common"]

    def test_validation(self, spark):
        from kinesis_stream_spark.operators.retrieval import prf_expansion

        docs = spark.createDataFrame([], "doc_id long, text string")
        q = spark.createDataFrame([], "query_id long, qtext string")
        with pytest.raises(ValueError):
            prf_expansion(docs, q, m=0)
        with pytest.raises(ValueError):
            prf_expansion(docs, q, t=0)
        assert prf_expansion(docs, q).count() == 0
