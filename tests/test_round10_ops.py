"""Unit tests for the round-10 operators — hand-computed fixtures and
degenerate inputs. Cross-engine parity is covered by
tests/test_oracle_parity.py (every registered oracle, sf0.001, every
session).
"""

from __future__ import annotations

import pytest


class TestLmPlausibility:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_hand_computed_laplace(self, spark):
        from kinesis_stream_spark.operators.text import lm_plausibility

        docs = self._docs(
            spark,
            [
                (0, "a b a"),   # train: bigrams "a b", "b a"
                (2, "a b"),     # train: "a b"  -> cb(a b)=2, cb(b a)=1
                (1, "a b c"),   # score
                (3, "z"),       # score, single token -> no row
                (5, "c c"),     # score, fully unseen
            ],
        )
        out = {r.doc_id: r for r in lm_plausibility(docs).collect()}
        assert set(out) == {1, 5}
        # ctx counts: a -> 2, b -> 1; V = {a, b} = 2
        # doc1: "a b": (2+1)*1e6 // (2+2) = 750000 (seen)
        #       "b c": (0+1)*1e6 // (1+2) = 333333 (unseen)
        r1 = out[1]
        assert r1.n_bigrams == 2 and r1.n_unseen == 1
        assert r1.sum_prob_ppm == 750000 + 333333
        assert r1.mean_prob_ppm == (750000 + 333333) / 2.0
        # doc5: "c c": unseen bigram, unseen ctx -> 1e6 // (0+2)
        r5 = out[5]
        assert r5.n_bigrams == 1 and r5.n_unseen == 1
        assert r5.sum_prob_ppm == 500000

    def test_plausible_outranks_soup(self, spark):
        """The filter's point: text walking the training corpus's
        transitions scores above shuffled token soup."""
        from kinesis_stream_spark.operators.text import lm_plausibility

        train = [(i * 2, "the quick fox jumps over the lazy dog") for i in range(8)]
        score = [
            (1, "the quick fox jumps over the lazy dog"),
            (3, "dog the over quick lazy jumps fox the"),
        ]
        out = {
            r.doc_id: r.mean_prob_ppm
            for r in lm_plausibility(self._docs(spark, train + score)).collect()
        }
        assert out[1] > out[3]

    def test_null_text_no_row(self, spark):
        from kinesis_stream_spark.operators.text import lm_plausibility

        docs = self._docs(spark, [(0, "a b"), (1, None)])
        assert lm_plausibility(docs).collect() == []


class TestHellingerDrift:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        )

    def test_identical_disjoint_and_one_sided(self, spark):
        import datetime as dt

        from kinesis_stream_spark.operators.profile import hellinger_drift

        t = lambda h: dt.datetime(2024, 1, 1, h)  # noqa: E731
        rows = []
        # key 'same': identical two-bin distributions in both halves
        # (span 0h..10h, midpoint 5h)
        for hour in (0, 1):            # early
            rows += [("same", t(hour), 10.0), ("same", t(hour), 400.0)]
        for hour in (8, 9):            # late
            rows += [("same", t(hour), 10.0), ("same", t(hour), 400.0)]
        # key 'flip': early mass in bin 0, late mass in bin 19 — disjoint
        rows += [("flip", t(0), 10.0), ("flip", t(9), 499.0)]
        # key 'solo': early half only -> NULL (no second distribution)
        rows += [("solo", t(0), 10.0)]
        # pin the global span so the midpoint is 4.5h for every key
        rows += [("same", t(10), 10.0), ("same", t(10), 400.0)]
        out = {r.key: r for r in hellinger_drift(self._ev(spark, rows)).collect()}
        # identical halves: BC sums to exactly 2^20 -> H = 0... the
        # extra t(10) rows skew 'same' late-half counts; recompute:
        # early (us <= mid): hours 0,1 -> 2x bin0 + 2x bin16
        # late: hours 8,9,10 -> 3x bin0 + 3x bin16 — still p == q per bin
        assert out["same"].hellinger == 0.0
        assert out["flip"].hellinger == 1.0
        assert out["solo"].hellinger is None
        assert out["solo"].n_late == 0 and out["solo"].n_early == 1

    def test_partial_overlap_hand_value(self, spark):
        import datetime as dt
        import math

        from kinesis_stream_spark.operators.profile import hellinger_drift

        t = lambda h: dt.datetime(2024, 1, 1, h)  # noqa: E731
        # early: [bin0, bin0], late: [bin0, bin19]
        # p = (1, 0), q = (0.5, 0.5); BC = sqrt(0.5); H = sqrt(1 - BC_fx)
        rows = [
            ("k", t(0), 1.0), ("k", t(1), 1.0),
            ("k", t(8), 1.0), ("k", t(9), 499.0),
        ]
        r = hellinger_drift(self._ev(spark, rows)).collect()[0]
        bc_fx = math.floor(math.sqrt(0.5) * (1 << 20))
        assert r.bc_fx == bc_fx
        assert r.hellinger == math.sqrt(1.0 - bc_fx / float(1 << 20))

    def test_validation(self, spark):
        from kinesis_stream_spark.operators.profile import hellinger_drift

        df = self._ev(spark, [])
        with pytest.raises(ValueError):
            hellinger_drift(df, n_bins=0)
        with pytest.raises(ValueError):
            hellinger_drift(df, lo=5.0, hi=5.0)


class TestAbDeltaRatio:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_type string, value double"
        )

    @staticmethod
    def _variant(uid):
        import hashlib

        return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2

    def test_matches_python_delta_method(self, spark):
        import math

        from kinesis_stream_spark.operators.experiment import ab_delta_ratio

        rows = []
        for u in range(1, 13):
            rows.append((u, "view", 1.0))
            rows.append((u, "view", 1.0))
            if u % 3:
                rows.append((u, "purchase", float(u * 5)))
        got = ab_delta_ratio(self._ev(spark, rows)).collect()[0]

        # python reference: per-unit (x = purchase value fx, y = events)
        per = {}
        for u, t, v in rows:
            x, y = per.get(u, (0.0, 0))
            per[u] = (x + (v if t == "purchase" else 0.0), y + 1)
        fx = 1 << 20
        arms = {0: [], 1: []}
        for u, (x, y) in per.items():
            arms[self._variant(u)].append((math.floor(x * fx), y))

        def delta(units):
            n = len(units)
            sx = sum(x for x, _ in units)
            sy = sum(y for _, y in units)
            r = sx / sy
            dn = n * (n - 1)
            m2x = (n * sum(x * x for x, _ in units) - sx * sx) / dn
            m2y = (n * sum(y * y for _, y in units) - sy * sy) / dn
            m2xy = (n * sum(x * y for x, y in units) - sx * sy) / dn
            ybar = sy / n
            return n, r, (m2x - 2 * r * m2xy + r * r * m2y) / (ybar * ybar) / n

        nc, rc, vc = delta(arms[0])
        nt, rt, vt = delta(arms[1])
        assert got.n_control == nc and got.n_treatment == nt
        assert abs(got.ratio_control - rc / fx) < 1e-12
        assert abs(got.ratio_treatment - rt / fx) < 1e-12
        assert abs(got.z_delta - (rt - rc) / math.sqrt(vc + vt)) < 1e-9

    def test_proportional_arms_null_z(self, spark):
        """x exactly proportional to y in both arms -> both delta
        variances are 0 -> NULL z (nothing stochastic to test)."""
        from kinesis_stream_spark.operators.experiment import ab_delta_ratio

        rows = []
        for u in range(1, 9):
            rows += [(u, "purchase", 10.0), (u, "purchase", 10.0)]
        got = ab_delta_ratio(self._ev(spark, rows)).collect()[0]
        assert got.z_delta is None
        assert got.ratio_control == got.ratio_treatment == 10.0

    def test_single_unit_arm_unscorable(self, spark):
        from kinesis_stream_spark.operators.experiment import ab_delta_ratio

        # users 1 and 2 hash to different arms (md5 parity: 1 -> ?, just
        # assert the contract: any arm with n < 2 yields NULL ratios)
        rows = [(1, "view", 1.0), (2, "view", 1.0)]
        got = ab_delta_ratio(self._ev(spark, rows)).collect()
        if got:  # both units could land in one arm; then no output row
            r = got[0]
            assert r.z_delta is None


class TestJoinCardinalityProfile:
    def test_hand_computed_self_and_cross(self, spark):
        from kinesis_stream_spark.operators.skew import (
            join_cardinality_profile,
        )

        left = spark.createDataFrame(
            [(1,), (1,), (1,), (2,), (3,), (None,)], "k long"
        )
        right = spark.createDataFrame(
            [(1,), (1,), (2,), (4,), (None,)], "k long"
        )
        out = {r.key: r for r in join_cardinality_profile(
            left, right, left_key="k", right_key="k", top_k=2
        ).collect()}
        # shared keys: 1 -> 3*2 = 6, 2 -> 1*1 = 1; keys 3/4 contribute 0
        tot = out["__total__"]
        assert tot.join_rows == 7
        assert tot.rows_left == 5 and tot.rows_right == 4  # NULLs excluded
        assert tot.share_ppm == 1_000_000
        assert out["1"].join_rows == 6
        assert out["1"].share_ppm == 6 * 1_000_000 // 7
        assert out["2"].join_rows == 1 and out["2"].rows_left == 1
        # exactness cross-check against the actually-run join
        assert left.join(right, "k").count() == 7

    def test_disjoint_keys_zero_total(self, spark):
        from kinesis_stream_spark.operators.skew import (
            join_cardinality_profile,
        )

        left = spark.createDataFrame([(1,)], "k long")
        right = spark.createDataFrame([(2,)], "k long")
        rows = join_cardinality_profile(
            left, right, left_key="k", right_key="k"
        ).collect()
        assert len(rows) == 1  # only the total row; no contributing keys
        assert rows[0].join_rows == 0 and rows[0].share_ppm is None

    def test_validation(self, spark):
        from kinesis_stream_spark.operators.skew import (
            join_cardinality_profile,
        )

        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError):
            join_cardinality_profile(df, df, left_key="k", right_key="k", top_k=0)


class TestQualityScorecard:
    def test_every_kind_hand_computed(self, spark):
        from kinesis_stream_spark.operators.profile import quality_scorecard

        df = spark.createDataFrame(
            [
                (1, "A", 10.0, "1-HI", 100),
                (1, "A", 20.0, "2-LO", 100),    # dup id
                (2, "B", -5.0, "bad", 200),     # range + regexp + set viol
                (None, "A", 5.0, "3-HI", 999),  # null id, orphan ref
                (3, None, None, None, None),    # nulls everywhere
                (3, "A", 30.0, "4-HI", 100),    # dup id (3 twice)
            ],
            "id long, status string, price double, prio string, fk long",
        )
        ref = spark.createDataFrame([(100,), (200,)], "pk long")
        specs = [
            {"name": "id_not_null", "kind": "not_null", "col": "id"},
            {"name": "id_unique", "kind": "unique", "col": "id"},
            {"name": "status_set", "kind": "in_set", "col": "status",
             "values": ("A", "B")},
            {"name": "price_range", "kind": "range", "col": "price",
             "lo": 0.0, "hi": 100.0},
            {"name": "prio_format", "kind": "regexp", "col": "prio",
             "pattern": "^[0-9]-"},
            {"name": "fk_ref", "kind": "ref", "col": "fk",
             "ref": "r", "ref_col": "pk"},
        ]
        out = {r.check_name: r for r in quality_scorecard(
            df, specs, ref_frames={"r": ref}
        ).collect()}
        assert len(out) == 6 and all(r.n_rows == 6 for r in out.values())
        assert out["id_not_null"].n_violations == 1
        # 6 rows, distinct non-null ids {1,2,3}, one NULL group ->
        # 6 - 3 - 1 = 2 duplicate rows
        assert out["id_unique"].n_violations == 2
        assert out["status_set"].n_violations == 1      # the NULL status
        assert out["price_range"].n_violations == 2     # -5.0 and NULL
        assert out["prio_format"].n_violations == 2     # 'bad' and NULL
        assert out["fk_ref"].n_violations == 1          # 999 (NULL passes)
        assert out["fk_ref"].violation_ppm == 1_000_000 // 6
        assert not out["fk_ref"].passed
        assert out["status_set"].passed is False

    def test_all_green_passes(self, spark):
        from kinesis_stream_spark.operators.profile import quality_scorecard

        df = spark.createDataFrame([(1,), (2,)], "id long")
        out = quality_scorecard(
            df,
            [{"name": "u", "kind": "unique", "col": "id"},
             {"name": "nn", "kind": "not_null", "col": "id"}],
        ).collect()
        assert all(r.passed and r.n_violations == 0 for r in out)

    def test_validation(self, spark):
        from kinesis_stream_spark.operators.profile import quality_scorecard

        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError):
            quality_scorecard(df, [])
        with pytest.raises(ValueError):
            quality_scorecard(df, [
                {"name": "x", "kind": "not_null", "col": "id"},
                {"name": "x", "kind": "unique", "col": "id"},
            ])
        with pytest.raises(ValueError):
            quality_scorecard(df, [{"name": "x", "kind": "nope", "col": "id"}])


class TestWeightedPrioritySample:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "grp string, id long, w double")

    def test_matches_python_reference(self, spark):
        import hashlib

        from kinesis_stream_spark.operators.sampling import (
            weighted_priority_sample,
        )

        rows = [("g", i, float((i % 7) + 1)) for i in range(1, 40)]
        rows += [("h", i, 2.5) for i in range(100, 110)]
        got = [
            (r.group_key, r.id, r.sample_rank)
            for r in weighted_priority_sample(
                self._df(spark, rows),
                group_col="grp", id_col="id", weight_col="w", k=3,
            ).orderBy("group_key", "sample_rank").collect()
        ]

        def pri(i, w):
            u = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % (1 << 31)
            wfx = int(w * (1 << 20))
            return (u * (1 << 31)) // wfx

        want = []
        for g in ("g", "h"):
            cand = sorted(
                ((pri(i, w), i) for gg, i, w in rows if gg == g)
            )[:3]
            want += [(g, i, r + 1) for r, (_, i) in enumerate(cand)]
        assert got == want

    def test_weight_monotone_for_fixed_draw(self, spark):
        """Same ids (same hash draws), uniformly heavier weights in
        group 'b' -> 'b' samples the same ids at lower priority; and
        within one group, scaling ALL weights leaves the sample
        unchanged (only relative weight matters)."""
        from kinesis_stream_spark.operators.sampling import (
            weighted_priority_sample,
        )

        base = [("a", i, 1.0) for i in range(50)]
        scaled = [("b", i, 8.0) for i in range(50)]
        out = weighted_priority_sample(
            self._df(spark, base + scaled),
            group_col="grp", id_col="id", weight_col="w", k=5,
        ).collect()
        picks = {}
        for r in out:
            picks.setdefault(r.group_key, set()).add(r.id)
        assert picks["a"] == picks["b"]

    def test_exclusions_and_validation(self, spark):
        from kinesis_stream_spark.operators.sampling import (
            weighted_priority_sample,
        )

        df = self._df(
            spark,
            [("g", 1, 1.0), ("g", 2, 0.0), ("g", 3, -1.0), ("g", 4, None),
             (None, 5, 1.0)],
        )
        out = weighted_priority_sample(
            df, group_col="grp", id_col="id", weight_col="w", k=10
        ).collect()
        assert [r.id for r in out] == [1]
        with pytest.raises(ValueError):
            weighted_priority_sample(
                df, group_col="grp", id_col="id", weight_col="w", k=0
            )


class TestRangeSearch:
    def test_threshold_semantics_vs_topk(self, spark):
        """Range = everything >= tau (unbounded count); consistency
        pin: its result equals the top-k result filtered to tau when
        k covers every qualifying neighbor."""
        from kinesis_stream_spark.operators.similarity import (
            range_search,
            topk_bruteforce,
        )

        vecs = [
            (0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.9, 0.1]),
            (3, [0.0, 1.0]), (4, [-1.0, 0.0]),
        ]
        emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        q = emb.where("vec_id = 0").selectExpr(
            "vec_id as query_id", "embedding"
        )
        got = {
            (r.query_id, r.neighbor_id)
            for r in range_search(emb, q, threshold=0.5).collect()
        }
        assert got == {(0, 1), (0, 2)}
        topk = {
            (r.query_id, r.neighbor_id)
            for r in topk_bruteforce(emb, q, k=10).collect()
            if r.cosine >= 0.5
        }
        assert got == topk

    def test_no_shuffle_in_plan(self, spark):
        from kinesis_stream_spark.operators.similarity import range_search

        emb = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.5, 0.5])],
            "vec_id long, embedding array<float>",
        )
        q = emb.selectExpr("vec_id as query_id", "embedding")
        plan = range_search(emb, q, threshold=0.3)._sc._jvm \
            .PythonSQLUtils.explainString(
                range_search(emb, q, threshold=0.3)._jdf.queryExecution(),
                "formatted",
            )
        # broadcast join + filter only: the scored side never exchanges
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan


def test_scorecard_ref_only_suite(spark):
    """A suite of ONLY referential constraints must not render a
    degenerate stack(0, ) — regression for the round-10 review."""
    from kinesis_stream_spark.operators.profile import quality_scorecard

    df = spark.createDataFrame([(100,), (999,)], "fk long")
    ref = spark.createDataFrame([(100,)], "pk long")
    out = quality_scorecard(
        df,
        [{"name": "fk_ref", "kind": "ref", "col": "fk",
          "ref": "r", "ref_col": "pk"}],
        ref_frames={"r": ref},
    ).collect()
    assert len(out) == 1
    assert out[0].n_violations == 1 and not out[0].passed


def test_delta_ratio_one_arm_still_one_row(spark):
    """Every unit in a single arm must still yield the operator's ONE
    output row (missing arm: n = 0, NULL ratio/z) — regression for
    the round-10 review."""
    from kinesis_stream_spark.operators.experiment import ab_delta_ratio

    # user 1 hashes to variant 1 (md5 parity), alone
    df = spark.createDataFrame(
        [(1, "purchase", 5.0), (1, "view", 1.0)],
        "user_id long, event_type string, value double",
    )
    rows = ab_delta_ratio(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_control + r.n_treatment == 1
    assert r.z_delta is None
    assert (r.ratio_control is None) or (r.ratio_treatment is None)
