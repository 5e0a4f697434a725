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


class TestHits:
    @staticmethod
    def _replica(edges, iterations=3):
        """Pure-Python integer replay of the HITS rounds."""
        from kinesis_stream_spark.operators.graph import HITS_SCALE

        e = sorted(set(edges))
        nodes = sorted({u for u, _ in e} | {v for _, v in e})
        h = {v: HITS_SCALE for v in nodes}
        a = {}
        for _ in range(iterations):
            araw = {}
            for u, v in e:
                araw[v] = araw.get(v, 0) + h.get(u, 0)
            t = sum(araw.values())
            a = {v: (r * HITS_SCALE) // t if t else 0 for v, r in araw.items()}
            hraw = {}
            for u, v in e:
                hraw[u] = hraw.get(u, 0) + a.get(v, 0)
            t = sum(hraw.values())
            h = {v: (r * HITS_SCALE) // t if t else 0 for v, r in hraw.items()}
        return {
            v: (h.get(v, 0), a.get(v, 0)) for v in nodes
        }

    def test_matches_python_integer_replica(self, spark):
        from kinesis_stream_spark.operators.graph import hits_scores

        edges = [
            ("a", "x"), ("b", "x"), ("b", "y"), ("c", "y"), ("c", "z"),
            ("x", "z"),  # a node that is both hub and authority
        ]
        df = spark.createDataFrame(edges, "src: string, dst: string")
        got = {
            r["node"]: (r["hub_fx"], r["auth_fx"])
            for r in hits_scores(df, iterations=3).collect()
        }
        assert got == self._replica(edges)

    def test_pure_source_has_zero_authority(self, spark):
        from kinesis_stream_spark.operators.graph import hits_scores

        df = spark.createDataFrame(
            [("a", "x"), ("b", "x")], "src: string, dst: string"
        )
        rows = {r["node"]: r for r in hits_scores(df).collect()}
        assert rows["a"]["auth_fx"] == 0 and rows["b"]["auth_fx"] == 0
        assert rows["x"]["hub_fx"] == 0
        assert rows["x"]["auth"] == 1.0  # sole authority takes all mass
        # two identical hubs split the hub mass
        assert rows["a"]["hub_fx"] == rows["b"]["hub_fx"]

    def test_duplicate_edges_collapse(self, spark):
        from kinesis_stream_spark.operators.graph import hits_scores

        once = spark.createDataFrame(
            [("a", "x"), ("b", "x"), ("b", "y")], "src: string, dst: string"
        )
        dup = once.unionAll(once)
        assert sorted(map(tuple, hits_scores(once).collect())) == sorted(
            map(tuple, hits_scores(dup).collect())
        )


class TestSaltedJoin:
    def test_matches_plain_join(self, spark):
        from kinesis_stream_spark.operators.skew import salted_join

        big = spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(60)],
            "rid: long, k: long, v: double",
        )
        small = spark.createDataFrame(
            [(0, "a"), (1, "b"), (2, "c"), (9, "zz")], "k2: long, seg: string"
        )
        got = (
            salted_join(
                big, small, big_key="k", small_key="k2",
                salt_src="rid", n_salts=4,
            )
            .groupBy("seg")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        want = (
            big.join(small, big.k == small.k2)
            .groupBy("seg")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    def test_left_join_preserves_null_and_unmatched(self, spark):
        from kinesis_stream_spark.operators.skew import salted_join

        big = spark.createDataFrame(
            [(1, 0), (2, None), (3, 7)], "rid: long, k: long"
        )
        small = spark.createDataFrame([(0, "a")], "k2: long, seg: string")
        rows = {
            r["rid"]: r["seg"]
            for r in salted_join(
                big, small, big_key="k", small_key="k2",
                salt_src="rid", n_salts=4, how="left",
            ).collect()
        }
        assert rows == {1: "a", 2: None, 3: None}

    def test_plan_pins_sort_merge_with_salt_key(self, spark, sf_dir):
        from kinesis_stream_spark.queries.relational import QUERIES
        from tests.test_plans import _explain

        plan = _explain(QUERIES["join_salted_skew_segments"](spark, sf_dir))
        assert "SortMergeJoin" in plan
        assert "_salt" in plan
        assert "BroadcastHashJoin" not in plan


class TestCompactionPlan:
    def _plan(self, spark, rows, target):
        from kinesis_stream_spark.operators.layout import compaction_plan

        df = spark.createDataFrame(
            rows, "part_key: string, file_id: long, bytes: long"
        )
        return {
            (r["part_key"], r["bin_id"]): (r["n_files"], r["bin_bytes"],
                                           r["fill_ppm"])
            for r in compaction_plan(
                df, bytes_col="bytes", target_bytes=target
            ).collect()
        }

    def test_hand_packed_bins(self, spark):
        # target 100: prefix-before 0,60,120,180,260 -> bins 0,0,1,1,2
        rows = [("p", 1, 60), ("p", 2, 60), ("p", 3, 60),
                ("p", 4, 80), ("p", 5, 40)]
        got = self._plan(spark, rows, 100)
        assert got == {
            ("p", 0): (2, 120, 1200000),
            ("p", 1): (2, 140, 1400000),
            ("p", 2): (1, 40, 400000),
        }

    def test_oversized_file_gets_own_bin(self, spark):
        # 350 > target: bins by prefix 0,350,360 -> 0,3,3
        rows = [("p", 1, 350), ("p", 2, 10), ("p", 3, 10)]
        got = self._plan(spark, rows, 100)
        assert got == {("p", 0): (1, 350, 3500000), ("p", 3): (2, 20, 200000)}

    def test_partitions_pack_independently(self, spark):
        rows = [("a", 1, 90), ("b", 1, 90), ("a", 2, 90), ("b", 2, 20)]
        got = self._plan(spark, rows, 100)
        assert got == {
            ("a", 0): (2, 180, 1800000),
            ("b", 0): (2, 110, 1100000),
        }

    def test_null_sizes_excluded(self, spark):
        rows = [("p", 1, 50), ("p", 2, None), ("p", 3, 60)]
        got = self._plan(spark, rows, 100)
        assert got == {("p", 0): (2, 110, 1100000)}


class TestRollingRegression:
    def _run(self, spark, rows, window_rows=3):
        from kinesis_stream_spark.operators.temporal import rolling_regression

        df = spark.createDataFrame(rows, "event_type: string, ts: timestamp, value: double")
        return {
            (r["key"], r["bucket"]): r
            for r in rolling_regression(
                df, window_rows=window_rows
            ).collect()
        }

    def test_hand_computed_slopes(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        # daily sums for key 'a': day0=1.0, day1=3.0, day2=5.0 (slope 2)
        rows = [
            ("a", base, 1.0),
            ("a", base + dt.timedelta(days=1), 1.5),
            ("a", base + dt.timedelta(days=1), 1.5),
            ("a", base + dt.timedelta(days=2), 5.0),
        ]
        got = self._run(spark, rows)
        d0 = got[("a", 19723)]  # 2024-01-01 epoch day
        assert d0["n_win"] == 1 and d0["slope"] is None
        d1 = got[("a", 19724)]
        assert d1["n_win"] == 2
        assert abs(d1["slope"] - 2.0) < 1e-5
        d2 = got[("a", 19725)]
        assert d2["n_win"] == 3
        assert abs(d2["slope"] - 2.0) < 1e-5

    def test_gap_keeps_true_offsets(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        # y at days 0 and 10: slope must use dx=10, not row distance 1
        rows = [
            ("a", base, 0.0),
            ("a", base + dt.timedelta(days=10), 10.0),
        ]
        got = self._run(spark, rows)
        last = got[("a", 19733)]
        assert last["n_win"] == 2
        assert abs(last["slope"] - 1.0) < 1e-5

    def test_window_slides_off_old_rows(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        # 4 days 0,100,0,100 with window 3: last window (100,0,100)
        rows = [
            ("a", base + dt.timedelta(days=i), float(v))
            for i, v in enumerate([0, 100, 0, 100])
        ]
        got = self._run(spark, rows)
        last = got[("a", 19726)]
        assert last["n_win"] == 3
        # OLS over x=(1,2,3), y=(100,0,100): slope = 0
        assert abs(last["slope"]) < 1e-5

    def test_null_ts_excluded(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [("a", base, 1.0), ("a", None, 99.0)]
        got = self._run(spark, rows)
        assert len(got) == 1
        assert got[("a", 19723)]["window_sum_fx"] == 1 << 20


class TestSimplifiedSilhouette:
    def _run(self, spark, rows):
        from kinesis_stream_spark.operators.evaluation import (
            simplified_silhouette,
        )

        df = spark.createDataFrame(
            rows, "vec_id: long, embedding: array<float>, label: int"
        )
        return {
            r["label_key"]: r for r in simplified_silhouette(df).collect()
        }

    def test_hand_computed_two_clusters(self, spark):
        rows = [
            (1, [0.0, 0.0], 0), (2, [2.0, 0.0], 0),
            (3, [10.0, 0.0], 1), (4, [12.0, 0.0], 1),
        ]
        got = self._run(spark, rows)
        # outer points: a=1, b=11 -> floor(10/11 * 1e6) = 909090
        # inner points: a=1, b=9  -> floor(8/9 * 1e6)  = 888888
        assert got["0"]["sum_sil_fx"] == 909090 + 888888
        assert got["1"]["sum_sil_fx"] == 909090 + 888888
        assert got["__all__"]["n_vectors"] == 4
        assert got["__all__"]["n_negative"] == 0
        assert got["0"]["mean_silhouette"] == (909090 + 888888) / 2 / 1e6

    def test_misassigned_point_goes_negative(self, spark):
        rows = [
            (1, [0.0], 0), (2, [0.2], 0),
            (3, [10.0], 1), (4, [10.2], 1),
            (5, [10.1], 0),  # labeled 0 but sits inside cluster 1
        ]
        got = self._run(spark, rows)
        assert got["0"]["n_negative"] == 1
        assert got["__all__"]["n_negative"] == 1

    def test_singleton_cluster_scores_one(self, spark):
        rows = [(1, [0.0], 0), (2, [5.0], 1), (3, [6.0], 1)]
        got = self._run(spark, rows)
        assert got["0"]["n_scored"] == 1
        assert got["0"]["sum_sil_fx"] == 1000000
        assert got["0"]["mean_silhouette"] == 1.0

    def test_single_label_corpus_is_unscorable(self, spark):
        rows = [(1, [0.0], 0), (2, [2.0], 0)]
        got = self._run(spark, rows)
        assert got["0"]["n_vectors"] == 2
        assert got["0"]["n_scored"] == 0
        assert got["0"]["mean_silhouette"] is None
        assert got["0"]["sum_sil_fx"] == 0


class TestKsTwoSample:
    def _run(self, spark, av, bv):
        from kinesis_stream_spark.operators.profile import ks_two_sample

        a = spark.createDataFrame([(float(v),) for v in av] or [(None,)],
                                  "v: double")
        b = spark.createDataFrame([(float(v),) for v in bv] or [(None,)],
                                  "v: double")
        return ks_two_sample(a, b).collect()[0]

    def test_identical_samples_give_zero(self, spark):
        r = self._run(spark, [1, 2, 3, 4], [1, 2, 3, 4])
        assert r["ks_d"] == 0.0 and r["d_num"] == 0.0
        assert (r["n_a"], r["n_b"], r["n_values"]) == (4, 4, 4)

    def test_disjoint_samples_give_one(self, spark):
        r = self._run(spark, [1, 2, 3], [10, 20, 30])
        assert r["ks_d"] == 1.0
        # K = D * sqrt(n_a*n_b/(n_a+n_b)) = sqrt(9/6)
        import math

        assert r["ks_stat"] == math.sqrt(9.0 / 6.0)

    def test_hand_computed_shifted(self, spark):
        # a = {1,2}, b = {2,3}: CDF gaps at v=1: |2*1-0|=2 (cum_a=1,n_b=2,
        # cum_b=0,n_a=2); v=2: |2*2-2*1|=2; v=3: 0 -> D = 2/(2*2) = 0.5
        r = self._run(spark, [1, 2], [2, 3])
        assert r["d_num"] == 2.0
        assert r["ks_d"] == 0.5

    def test_empty_side_reports_null(self, spark):
        r = self._run(spark, [], [1, 2])
        assert r["n_a"] == 0 and r["n_b"] == 2
        assert r["ks_d"] is None and r["ks_stat"] is None

    def test_matches_scipy_style_reference(self, spark):
        # python reference: D = max |F1 - F2| over pooled values
        av = [1, 1, 2, 5, 7, 7, 9]
        bv = [2, 3, 3, 6, 8]
        pooled = sorted(set(av) | set(bv))
        d = max(
            abs(
                sum(1 for x in av if x <= v) / len(av)
                - sum(1 for x in bv if x <= v) / len(bv)
            )
            for v in pooled
        )
        r = self._run(spark, av, bv)
        assert abs(r["ks_d"] - d) < 1e-12


class TestCentroidConfusion:
    def _run(self, spark, rows):
        from kinesis_stream_spark.operators.evaluation import (
            centroid_confusion,
        )

        df = spark.createDataFrame(
            rows, "vec_id: long, embedding: array<float>, label: int"
        )
        return {
            (r["label_key"], r["assigned_key"]): r
            for r in centroid_confusion(df).collect()
        }

    def test_separated_clusters_are_diagonal(self, spark):
        rows = [
            (1, [0.0], 0), (2, [0.2], 0),
            (3, [10.0], 1), (4, [10.2], 1),
        ]
        got = self._run(spark, rows)
        assert got[("0", "0")]["n_vectors"] == 2
        assert got[("1", "1")]["n_vectors"] == 2
        assert got[("0", "0")]["row_share_ppm"] == 1000000
        assert got[("0", "0")]["is_correct"] is True
        assert len(got) == 2

    def test_misassigned_point_lands_off_diagonal(self, spark):
        rows = [
            (1, [0.0], 0), (2, [0.2], 0),
            (3, [10.0], 1), (4, [10.2], 1),
            (5, [10.1], 0),  # true 0, nearest centroid 1
        ]
        got = self._run(spark, rows)
        # label 0 row: 2 of 3 correct, 1 assigned to "1"
        assert got[("0", "0")]["n_vectors"] == 2
        assert got[("0", "1")]["n_vectors"] == 1
        assert got[("0", "1")]["is_correct"] is False
        assert got[("0", "0")]["row_share_ppm"] == 666666
        assert got[("0", "1")]["row_share_ppm"] == 333333

    def test_equidistant_tie_breaks_to_smaller_label(self, spark):
        # point 3 (label 9) sits at 1.0; its own centroid is pulled to
        # 4.0 by point 4, while singleton centroids "0" (at 0.0) and
        # "1" (at 2.0) are both exactly 1.0 away -> the (d2, clabel)
        # tie-break deterministically assigns "0"
        rows = [
            (1, [0.0], 0),
            (2, [2.0], 1),
            (3, [1.0], 9),
            (4, [7.0], 9),
        ]
        got = self._run(spark, rows)
        assert got[("9", "0")]["n_vectors"] == 1


class TestReviewFixes:
    def test_salted_join_null_salt_src_still_joins(self, spark):
        from kinesis_stream_spark.operators.skew import salted_join

        big = spark.createDataFrame(
            [(1, 0), (None, 0), (3, 7)], "rid: long, k: long"
        )
        small = spark.createDataFrame([(0, "a")], "k2: long, seg: string")
        rows = sorted(
            [
                (r["rid"], r["seg"])
                for r in salted_join(
                    big, small, big_key="k", small_key="k2",
                    salt_src="rid", n_salts=4,
                ).collect()
            ],
            key=str,
        )
        # the NULL-rid row coalesces to salt 0 and still matches key 0
        assert rows == sorted([(1, "a"), (None, "a")], key=str)

    def test_salted_join_rejects_right_and_full(self, spark):
        import pytest

        from kinesis_stream_spark.operators.skew import salted_join

        big = spark.createDataFrame([(1, 0)], "rid: long, k: long")
        small = spark.createDataFrame([(0, "a")], "k2: long, seg: string")
        for how in ("right", "full", "outer"):
            with pytest.raises(ValueError):
                salted_join(
                    big, small, big_key="k", small_key="k2",
                    salt_src="rid", how=how,
                )

    def test_hits_rejects_zero_iterations(self, spark):
        import pytest

        from kinesis_stream_spark.operators.graph import (
            hits_scores,
            sql_hits_scores,
        )

        df = spark.createDataFrame([("a", "x")], "src: string, dst: string")
        with pytest.raises(ValueError):
            hits_scores(df, iterations=0)
        with pytest.raises(ValueError):
            sql_hits_scores("SELECT 1 AS src, 2 AS dst", iterations=0)

    def test_confusion_null_distance_loses_argmin(self, spark):
        from kinesis_stream_spark.operators.evaluation import (
            centroid_confusion,
        )

        # label 9's only vector is NULL at every position -> d2 to its
        # centroid is NULL for every point; NULL must lose the argmin
        rows = [
            (1, [0.0], 0), (2, [0.2], 0),
            (3, [None], 9),
        ]
        df = spark.createDataFrame(
            rows, "vec_id: long, embedding: array<float>, label: int"
        )
        got = {
            (r["label_key"], r["assigned_key"]): r["n_vectors"]
            for r in centroid_confusion(df).collect()
        }
        assert got[("0", "0")] == 2  # not assigned to the NULL centroid


class TestWelchTtest:
    def _run(self, spark, rows):
        from kinesis_stream_spark.operators.experiment import ab_welch_ttest

        df = spark.createDataFrame(rows, "user_id: long, value: double")
        return ab_welch_ttest(df).collect()[0]

    @staticmethod
    def _variant(uid):
        import hashlib

        return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2

    def test_matches_scipy_style_reference(self, spark):
        import math

        # per-unit totals with both arms populated (hash decides arms)
        rows = [(u, float(v)) for u, v in [
            (1, 10), (1, 5), (2, 20), (3, 7), (4, 40), (5, 12),
            (6, 3), (7, 30), (8, 22), (9, 15),
        ]]
        got = self._run(spark, rows)
        totals = {}
        for u, v in rows:
            totals[u] = totals.get(u, 0.0) + v
        arms = {0: [], 1: []}
        for u, t in totals.items():
            arms[self._variant(u)].append(t)
        c, t = arms[0], arms[1]
        assert got["n_control"] == len(c)
        assert got["n_treatment"] == len(t)

        def mv(xs):
            m = sum(xs) / len(xs)
            var = sum((x - m) ** 2 for x in xs) / (len(xs) - 1)
            return m, var

        mc, vc = mv(c)
        mt, vt = mv(t)
        assert abs(got["mean_control"] - mc) < 1e-9
        assert abs(got["var_treatment"] - vt) < 1e-6
        se2 = vc / len(c) + vt / len(t)
        assert abs(got["t_stat"] - (mt - mc) / math.sqrt(se2)) < 1e-9
        dof = se2 ** 2 / (
            (vc / len(c)) ** 2 / (len(c) - 1)
            + (vt / len(t)) ** 2 / (len(t) - 1)
        )
        assert abs(got["welch_dof"] - dof) < 1e-6

    def test_single_unit_arm_is_unscorable(self, spark):
        # find one unit per arm
        u0 = next(u for u in range(100) if self._variant(u) == 0)
        u1 = next(u for u in range(100) if self._variant(u) == 1)
        got = self._run(spark, [(u0, 5.0), (u1, 9.0)])
        assert got["t_stat"] is None and got["welch_dof"] is None
        assert got["var_control"] is None

    def test_null_value_counts_as_zero_total(self, spark):
        u0 = [u for u in range(100) if self._variant(u) == 0][:2]
        u1 = [u for u in range(100) if self._variant(u) == 1][:2]
        rows = [(u0[0], None), (u0[1], 4.0), (u1[0], 2.0), (u1[1], 6.0)]
        got = self._run(spark, rows)
        assert got["n_control"] == 2
        assert got["mean_control"] == 2.0  # (0 + 4) / 2


class TestGrowthAccounting:
    def _run(self, spark, rows, dormancy=7):
        import datetime as dt

        from kinesis_stream_spark.operators.temporal import growth_accounting

        base = dt.datetime(2024, 1, 1)  # epoch day 19723
        data = [
            (u, base + dt.timedelta(days=d)) for u, d in rows
        ]
        df = spark.createDataFrame(data, "user_id: long, ts: timestamp")
        return {
            (r["day"] - 19723, r["status"]): r["n_users"]
            for r in growth_accounting(df, dormancy_days=dormancy).collect()
        }

    def test_lifecycle_classification(self, spark):
        # user 1: days 0, 3 (retained), 20 (resurrected)
        # user 2: day 0 only -> churned at day 8 (horizon 20)
        got = self._run(spark, [(1, 0), (1, 3), (1, 20), (2, 0)])
        assert got[(0, "new")] == 2
        assert got[(3, "retained")] == 1
        assert got[(20, "resurrected")] == 1
        # user 1 dormancy spell after day 3 -> churn at 11; user 2 at 8
        assert got[(11, "churned")] == 1
        assert got[(8, "churned")] == 1
        # no churn asserted past the horizon (user 1's final spell
        # would churn at day 28 > horizon 20)
        assert (28, "churned") not in got

    def test_actives_identity_holds(self, spark):
        rows = [(u, d) for u in range(5) for d in (0, 2, 11)]
        got = self._run(spark, rows)
        for d in (0, 2, 11):
            total = sum(
                got.get((d, s), 0)
                for s in ("new", "retained", "resurrected")
            )
            assert total == 5

    def test_same_day_duplicate_events_count_once(self, spark):
        got = self._run(spark, [(1, 0), (1, 0), (1, 0)])
        assert got[(0, "new")] == 1
        assert sum(n for (d, s), n in got.items() if s == "new") == 1


class TestAnovaOneway:
    def _run(self, spark, rows):
        from kinesis_stream_spark.operators.experiment import anova_oneway

        df = spark.createDataFrame(rows, "event_type: string, value: double")
        return anova_oneway(df).collect()[0]

    def test_matches_textbook_f(self, spark):
        # classic 3-group example; integral values make fx exact
        groups = {"a": [1, 2, 3], "b": [4, 5, 6], "c": [7, 8, 12]}
        rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
        got = self._run(spark, rows)
        allv = [v for vs in groups.values() for v in vs]
        gm = sum(allv) / len(allv)
        ssb = sum(
            len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in groups.values()
        )
        ssw = sum(
            (v - sum(vs) / len(vs)) ** 2
            for vs in groups.values()
            for v in vs
        )
        assert got["n_events"] == 9 and got["k_groups"] == 3
        assert abs(got["ssb"] - ssb) < 1e-6
        assert abs(got["ssw"] - ssw) < 1e-6
        f = (ssb / 2) / (ssw / 6)
        assert abs(got["f_stat"] - f) < 1e-6
        assert abs(got["eta_squared"] - ssb / (ssb + ssw)) < 1e-9

    def test_identical_groups_give_zero_f(self, spark):
        rows = [(g, float(v)) for g in ("a", "b") for v in (1, 2, 3)]
        got = self._run(spark, rows)
        assert abs(got["f_stat"]) < 1e-9
        assert abs(got["eta_squared"]) < 1e-9

    def test_single_group_unscorable(self, spark):
        got = self._run(spark, [("a", 1.0), ("a", 5.0)])
        assert got["k_groups"] == 1
        assert got["f_stat"] is None

    def test_constant_values_unscorable(self, spark):
        got = self._run(spark, [("a", 2.0), ("a", 2.0), ("b", 2.0)])
        assert got["ssw"] == 0.0
        assert got["f_stat"] is None


class TestAnovaReviewFixes:
    @staticmethod
    def _replica(groups):
        """Pure-Python integer replay of the fx ANOVA pipeline."""
        import math

        from kinesis_stream_spark.operators.experiment import ANOVA_SCALE

        s2 = float(ANOVA_SCALE) * float(ANOVA_SCALE)
        mom = {
            g: (
                len(vs),
                sum(math.floor(v * ANOVA_SCALE) for v in vs),
                sum(math.floor(v * ANOVA_SCALE) ** 2 for v in vs),
            )
            for g, vs in groups.items()
        }
        n = sum(m[0] for m in mom.values())
        a = sum(sg * sg // ng for ng, sg, _ in mom.values())
        q = sum(m[2] for m in mom.values())
        stot = sum(m[1] for m in mom.values())
        grand = stot * stot // n
        ssw = (float(q) - float(a)) / s2
        ssb = max((float(a) - float(grand)) / s2, 0.0)
        return ssb, ssw

    def test_quantization_floor_never_goes_negative(self, spark):
        from kinesis_stream_spark.operators.experiment import (
            ANOVA_SCALE,
            anova_oneway,
        )

        # sub-quantum values: true SSB = 0 but per-group floors used to
        # drive the raw difference to -1 fx^2 -> F = eta = -1.0
        eps = 1.0 / ANOVA_SCALE
        rows = [(g, v) for g in ("a", "b") for v in (eps, 2 * eps)]
        df = spark.createDataFrame(rows, "event_type: string, value: double")
        got = anova_oneway(df).collect()[0]
        assert got["ssb"] >= 0.0
        assert got["f_stat"] is None or got["f_stat"] >= 0.0
        assert got["eta_squared"] is None or got["eta_squared"] >= 0.0

    def test_huge_values_no_decimal_overflow(self, spark):
        from kinesis_stream_spark.operators.experiment import anova_oneway

        # one-stage decimal division used to raise
        # NUMERIC_VALUE_OUT_OF_RANGE here (S_g^2/n_g > 1e32) while the
        # DuckDB oracle sailed on
        groups = {"a": [2.0e10, 2.1e10], "b": [1.0e10, 0.9e10]}
        rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
        df = spark.createDataFrame(rows, "event_type: string, value: double")
        got = anova_oneway(df).collect()[0]
        ssb, ssw = self._replica(groups)
        assert abs(got["ssb"] - ssb) <= max(1e-9 * ssb, 1e-6)
        assert abs(got["ssw"] - ssw) <= max(1e-9 * ssw, 1e-6)
        assert got["f_stat"] > 0


class TestRunsTest:
    def _run(self, spark, series):
        import datetime as dt

        from kinesis_stream_spark.operators.temporal import runs_test

        base = dt.datetime(2024, 1, 1)
        rows = [
            ("k", base + dt.timedelta(days=i), float(v))
            for i, v in enumerate(series)
        ]
        df = spark.createDataFrame(rows, "event_type: string, ts: timestamp, value: double")
        return runs_test(df).collect()[0]

    def test_alternating_series_counts_runs(self, spark):
        import math

        # values 1,3,2,4,3,5: diffs +,-,+,-,+ -> 5 moves, 5 runs
        got = self._run(spark, [1, 3, 2, 4, 3, 5])
        assert (got["n_moves"], got["n_up"], got["n_down"]) == (5, 3, 2)
        assert got["n_runs"] == 5
        n, p2 = 5.0, 2.0 * 3 * 2
        mu = 1 + p2 / n
        var = p2 * (p2 - n) / (n * n * (n - 1))
        assert abs(got["z_runs"] - (5 - mu) / math.sqrt(var)) < 1e-12

    def test_streaky_series_scores_negative(self, spark):
        # monotone rise then monotone fall: 2 runs out of 9 moves
        got = self._run(spark, [1, 2, 3, 4, 5, 4, 3, 2, 1, 0])
        assert got["n_runs"] == 2
        assert got["z_runs"] < 0

    def test_zero_diffs_dropped(self, spark):
        got = self._run(spark, [1, 1, 2, 2, 3])
        assert got["n_moves"] == 2  # two rises, flats dropped
        assert got["n_down"] == 0
        assert got["z_runs"] is None  # one-sided -> sigma undefined

    def test_monotone_series_unscorable(self, spark):
        got = self._run(spark, [1, 2, 3, 4])
        assert got["n_down"] == 0 and got["z_runs"] is None


class TestMannWhitney:
    @staticmethod
    def _variant(uid):
        import hashlib

        return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2

    def _run(self, spark, rows):
        from kinesis_stream_spark.operators.experiment import ab_mann_whitney

        df = spark.createDataFrame(rows, "user_id: long, value: double")
        return ab_mann_whitney(df).collect()[0]

    def test_matches_scipy_style_reference(self, spark):
        import math

        rows = [(u, float(v)) for u, v in [
            (1, 10), (2, 20), (3, 7), (4, 40), (5, 12),
            (6, 3), (7, 30), (8, 22), (9, 15), (10, 15),
        ]]
        got = self._run(spark, rows)
        totals = {}
        for u, v in rows:
            totals[u] = totals.get(u, 0.0) + v
        pooled = sorted(totals.values())

        def midrank(x):
            less = sum(1 for y in pooled if y < x)
            eq = sum(1 for y in pooled if y == x)
            return less + (eq + 1) / 2

        arms = {0: [], 1: []}
        for u, t in totals.items():
            arms[self._variant(u)].append(t)
        c, t = arms[0], arms[1]
        r0 = sum(midrank(x) for x in c)
        u0 = r0 - len(c) * (len(c) + 1) / 2
        u1 = len(c) * len(t) - u0
        assert got["u_control"] == u0
        assert got["u_treatment"] == u1
        n = len(pooled)
        # tie correction over tie groups
        from collections import Counter

        ties = sum(m ** 3 - m for m in Counter(pooled).values())
        var = (len(c) * len(t) / 12) * (n + 1 - ties / (n * (n - 1)))
        z = (u1 - len(c) * len(t) / 2) / math.sqrt(var)
        assert abs(got["z_mw"] - z) < 1e-12
        rb = 2 * u1 / (len(c) * len(t)) - 1
        assert abs(got["rank_biserial"] - rb) < 1e-12

    def test_all_tied_values_unscorable(self, spark):
        u0 = [u for u in range(100) if self._variant(u) == 0][:2]
        u1 = [u for u in range(100) if self._variant(u) == 1][:2]
        rows = [(u, 5.0) for u in u0 + u1]
        got = self._run(spark, rows)
        assert got["z_mw"] is None
        assert got["u_control"] == got["u_treatment"]  # all midranks equal

    def test_total_separation_gives_extreme_u(self, spark):
        u0 = [u for u in range(100) if self._variant(u) == 0][:3]
        u1 = [u for u in range(100) if self._variant(u) == 1][:3]
        rows = [(u, 1.0 * i) for i, u in enumerate(u0)] + [
            (u, 100.0 + i) for i, u in enumerate(u1)
        ]
        got = self._run(spark, rows)
        assert got["u_treatment"] == 9.0  # every t unit beats every c
        assert got["u_control"] == 0.0
        assert got["rank_biserial"] == 1.0


class TestModularity:
    def _run(self, spark, edges, rounds=3):
        from kinesis_stream_spark.operators.graph import modularity

        df = spark.createDataFrame(edges, "src: string, dst: string")
        return {
            r["community"]: r
            for r in modularity(df, rounds=rounds).collect()
        }

    def test_two_cliques_with_bridge_score_high(self, spark):
        # two triangles joined by one bridge edge: LPA finds the two
        # communities; known modularity for this classic graph
        edges = [
            ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
            ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
            ("a3", "b1"),
        ]
        got = self._run(spark, edges)
        tot = got["__total__"]
        assert tot["internal_edges"] <= 7
        assert tot["degree_sum"] == 14  # 2m
        # Q for a near-perfect 2-community split of 7 edges: each
        # community has 3 internal edges; degrees 7 per side
        # Q = sum(L_c/m - (D_c/2m)^2) = 2*(3/7 - (7/14)^2) = 6/7 - 1/2
        if len(got) == 3:  # LPA found exactly the 2 cliques
            assert abs(tot["q_contrib"] - (6 / 7 - 0.5)) < 1e-12

    def test_total_is_sum_of_contribs(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
        got = self._run(spark, edges)
        tot = got.pop("__total__")
        s = sum(r["q_contrib"] for r in got.values())
        assert abs(tot["q_contrib"] - s) < 1e-12
        assert tot["n_nodes"] == sum(r["n_nodes"] for r in got.values())

    def test_single_community_scores_zero(self, spark):
        # if everything lands in one community, L_c = m and D_c = 2m:
        # Q = m/m - (2m/2m)^2 = 0
        edges = [("a", "b"), ("b", "c"), ("a", "c")]
        got = self._run(spark, edges)
        tot = got["__total__"]
        if len(got) == 2:
            assert abs(tot["q_contrib"]) < 1e-12

    def test_empty_graph_contract(self, spark):
        got = self._run(spark, [("a", "a")])  # self-loop only -> empty
        assert set(got) == {"__total__"}
        assert got["__total__"]["n_nodes"] == 0
        assert got["__total__"]["q_contrib"] is None
