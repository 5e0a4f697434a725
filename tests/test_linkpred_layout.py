"""Unit tests for the round-9 link-prediction / CF-cosine / zone-map /
column-profiler operators — hand-computed fixtures and degenerate
inputs. Cross-engine parity is covered by tests/test_oracle_parity.py;
these pin the MATH and the contracts.
"""

from __future__ import annotations

import pytest


class TestLinkPredictionRA:
    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "src string, dst string")

    def test_hand_computed_scores(self, spark):
        from kinesis_stream_spark.operators.graph import link_prediction_ra

        # intermediates: w1 deg 2 -> quantum 500000, w2 deg 3 -> 333333
        rows = [
            ("w1", "x"), ("w1", "y"),
            ("w2", "x"), ("w2", "y"), ("w2", "z"),
        ]
        out = {
            (r["node_a"], r["node_b"]): r
            for r in link_prediction_ra(
                self._edges(spark, rows), min_common=1
            ).collect()
        }
        assert out[("x", "y")]["n_common"] == 2
        assert out[("x", "y")]["ra_ppm"] == 500_000 + 333_333
        assert out[("x", "z")]["ra_ppm"] == 333_333
        assert out[("y", "z")]["ra_ppm"] == 333_333

    def test_hub_intermediate_capped_out(self, spark):
        from kinesis_stream_spark.operators.graph import link_prediction_ra

        hub = [("hub", f"n{i}") for i in range(30)]
        rare = [("w", "n0"), ("w", "n1")]
        out = link_prediction_ra(
            self._edges(spark, hub + rare),
            max_intermediate_degree=20,
            min_common=1,
        ).collect()
        # the 30-degree hub contributes nothing; only w's single pair
        assert len(out) == 1
        assert (out[0]["node_a"], out[0]["node_b"]) == ("n0", "n1")
        assert out[0]["ra_ppm"] == 500_000

    def test_min_common_prunes(self, spark):
        from kinesis_stream_spark.operators.graph import link_prediction_ra

        rows = [("w1", "x"), ("w1", "y")]
        assert (
            link_prediction_ra(
                self._edges(spark, rows), min_common=2
            ).count()
            == 0
        )

    def test_empty_and_validation(self, spark):
        from kinesis_stream_spark.operators.graph import link_prediction_ra

        assert link_prediction_ra(self._edges(spark, [])).count() == 0
        with pytest.raises(ValueError):
            link_prediction_ra(
                self._edges(spark, []), max_intermediate_degree=1
            )


class TestItemCosine:
    def test_hand_computed_cosine(self, spark):
        from kinesis_stream_spark.operators.basket import item_cosine

        # a in baskets {1,2,3,4}; b in {1,2}: common 2,
        # cosine = 2/sqrt(8)
        rows = [(1, "a"), (2, "a"), (3, "a"), (4, "a"), (1, "b"), (2, "b")]
        df = spark.createDataFrame(rows, "basket long, item string")
        out = item_cosine(df, min_common=1).collect()
        assert len(out) == 1
        assert out[0]["common"] == 2
        assert out[0]["cosine"] == pytest.approx(2.0 / 8.0**0.5, abs=1e-12)

    def test_jaccard_cosine_rank_disagreement(self, spark):
        from kinesis_stream_spark.operators.basket import (
            item_cosine,
            item_jaccard,
        )

        # niche pair (c,d): 2 baskets each, both shared.
        # popular pair (a,b): 8 baskets each, 5 shared.
        rows = (
            [(i, "a") for i in range(8)]
            + [(i, "b") for i in range(3, 11)]
            + [(100, "c"), (101, "c"), (100, "d"), (101, "d")]
        )
        df = spark.createDataFrame(rows, "basket long, item string")
        cos = {
            (r["item_a"], r["item_b"]): r["cosine"]
            for r in item_cosine(df, min_common=1).collect()
        }
        jac = {
            (r["item_a"], r["item_b"]): r["jaccard"]
            for r in item_jaccard(df, min_common=1).collect()
        }
        # the perfectly-aligned niche pair tops both, but the popular
        # pair's cosine (5/8) beats its jaccard (5/11) — the union
        # penalty is what separates the kernels
        assert cos[("c", "d")] == pytest.approx(1.0)
        assert jac[("c", "d")] == pytest.approx(1.0)
        assert cos[("a", "b")] == pytest.approx(5.0 / 8.0)
        assert jac[("a", "b")] == pytest.approx(5.0 / 11.0)


class TestZonemapSkipping:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "k long, rid long")

    def test_clustered_skips_hash_reads_all(self, spark):
        from kinesis_stream_spark.operators.layout import zonemap_skipping

        # keys 0..159, ids a bijective scatter (gcd(7,160)=1) so every
        # hash bucket's zone starts at a key ≤ 15 and spans the domain
        rows = [(k, k * 7 % 160) for k in range(160)]
        out = {
            r["layout"]: r
            for r in zonemap_skipping(
                self._df(spark, rows),
                key_col="k",
                id_col="rid",
                pred_lo=0,
                pred_hi=15,
                buckets=16,
            ).collect()
        }
        rng, hsh = out["range"], out["hash"]
        assert rng["rows_total"] == hsh["rows_total"] == 160
        assert rng["rows_matching"] == hsh["rows_matching"] == 16
        # range layout: 160 rows into 16 buckets of 10 sorted keys; the
        # predicate covers bucket 0 fully and bucket 1 partially
        assert rng["buckets_read"] == 2 and rng["rows_read"] == 20
        assert rng["skipped_ppm"] == 875_000
        assert rng["read_amplification_ppm"] == 1_250_000
        # hash layout: every bucket holds one residue class mod 16, so
        # each zone intersects [0, 15] -> read everything
        assert hsh["buckets_read"] == 16 and hsh["rows_read"] == 160
        assert hsh["skipped_ppm"] == 0
        assert hsh["read_amplification_ppm"] == 10_000_000

    def test_no_match_amplification_null(self, spark):
        from kinesis_stream_spark.operators.layout import zonemap_skipping

        rows = [(k, k) for k in range(10)]
        out = zonemap_skipping(
            self._df(spark, rows),
            key_col="k",
            id_col="rid",
            pred_lo=1000,
            pred_hi=2000,
            buckets=4,
        ).collect()
        for r in out:
            assert r["rows_read"] == 0
            assert r["read_amplification_ppm"] is None
            assert r["skipped_ppm"] == 1_000_000

    def test_empty_and_validation(self, spark):
        from kinesis_stream_spark.operators.layout import zonemap_skipping

        empty = self._df(spark, [])
        assert (
            zonemap_skipping(
                empty, key_col="k", id_col="rid", pred_lo=0, pred_hi=1
            ).count()
            == 0
        )
        with pytest.raises(ValueError):
            zonemap_skipping(
                empty, key_col="k", id_col="rid", pred_lo=5, pred_hi=1
            )


class TestCategoryBalance:
    def test_hand_computed_balance(self, spark):
        from kinesis_stream_spark.operators.profile import category_balance

        rows = [("x",), ("x",), ("x",), ("y",)] * 1 + [(None,)]
        df = spark.createDataFrame(rows, "c1 string")
        out = category_balance(df, ["c1"]).collect()[0]
        assert out["n_rows"] == 5 and out["n_nulls"] == 1
        assert out["n_distinct"] == 2 and out["top_count"] == 3
        assert out["top_share_ppm"] == 750_000
        # gini impurity = 1 - (9+1)/16 = 0.375
        assert out["gini_impurity_ppm"] == 375_000
        # effective categories = 16/10 = 1.6
        assert out["effective_categories_milli"] == 1_600

    def test_all_null_column(self, spark):
        from kinesis_stream_spark.operators.profile import category_balance

        df = spark.createDataFrame([(None,), (None,)], "c1 string")
        out = category_balance(df, ["c1"]).collect()[0]
        assert out["n_nulls"] == 2 and out["n_distinct"] == 0
        assert out["gini_impurity_ppm"] is None
        assert out["effective_categories_milli"] is None


class TestUniquenessProfile:
    def test_key_vs_non_key(self, spark):
        from kinesis_stream_spark.operators.profile import uniqueness_profile

        rows = [(1, "a"), (2, "a"), (3, "b")]
        df = spark.createDataFrame(rows, "id long, grp string")
        out = {
            r["column_name"]: r
            for r in uniqueness_profile(df, ["id", "grp"]).collect()
        }
        assert out["id"]["is_unique_key"] is True
        assert out["id"]["n_dup_rows"] == 0
        assert out["id"]["uniqueness_ppm"] == 1_000_000
        assert out["grp"]["is_unique_key"] is False
        assert out["grp"]["n_dup_rows"] == 2  # the two 'a' rows
        assert out["grp"]["max_group"] == 2
        assert out["grp"]["uniqueness_ppm"] == 666_666

    def test_null_breaks_key_contract(self, spark):
        from kinesis_stream_spark.operators.profile import uniqueness_profile

        df = spark.createDataFrame([(1,), (None,)], "id long")
        out = uniqueness_profile(df, ["id"]).collect()[0]
        assert out["is_unique_key"] is False
        assert out["n_dup_rows"] == 0
