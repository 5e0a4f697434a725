"""Unit tests for leave-one-out smoothed target encoding — hand-
computed encodings, the leakage guard, contracts, partition
invariance."""

from __future__ import annotations

import math

import pytest

FX = 1 << 20


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, cat string, y double")


def _run(spark, rows, m=0):
    from kinesis_stream_spark.operators.encoding import target_encoding

    out = target_encoding(
        _df(spark, rows),
        id_col="id",
        category_col="cat",
        target_col="y",
        smoothing=m,
    ).collect()
    return {r.id: r for r in out}


def _expected(rows, rid, m):
    fx = {i: math.floor(y * FX) for i, c, y in rows}
    cat = {c for i, cc, y in rows if i == rid for c in [cc]}.pop()
    members = [i for i, c, _ in rows if c == cat]
    n_all = len(rows)
    sall = sum(fx.values())
    scat = sum(fx[i] for i in members)
    den = n_all * (len(members) - 1 + m)
    if den <= 0:
        return None
    return (n_all * (scat - fx[rid]) + m * sall) / den / FX


class TestHandComputed:
    ROWS = [
        (1, "a", 10.0),
        (2, "a", 20.0),
        (3, "a", 30.0),
        (4, "b", 5.0),
        (5, "b", 7.0),
    ]

    def test_loo_no_smoothing(self, spark):
        got = _run(spark, self.ROWS, m=0)
        # row 1 (cat a): mean of {20, 30} = 25
        assert got[1].encoded == pytest.approx(25.0, rel=1e-12)
        assert got[2].encoded == pytest.approx(20.0, rel=1e-12)
        assert got[4].encoded == pytest.approx(7.0, rel=1e-12)
        for rid in (1, 2, 3, 4, 5):
            assert got[rid].encoded == pytest.approx(
                _expected(self.ROWS, rid, 0), rel=1e-12
            )

    def test_smoothing_shrinks_toward_global(self, spark):
        got = _run(spark, self.ROWS, m=1000)
        gmean = sum(math.floor(y * FX) for _, _, y in self.ROWS) / 5 / FX
        for rid in (1, 4):
            assert got[rid].encoded == pytest.approx(gmean, rel=5e-3)
            assert got[rid].encoded == pytest.approx(
                _expected(self.ROWS, rid, 1000), rel=1e-12
            )

    def test_leakage_guard_excludes_own_label(self, spark):
        # two-row category: each row's encoding is EXACTLY the other's y
        rows = [(1, "a", 2.0), (2, "a", 8.0)]
        got = _run(spark, rows, m=0)
        assert got[1].encoded == pytest.approx(8.0, rel=1e-12)
        assert got[2].encoded == pytest.approx(2.0, rel=1e-12)

    def test_singleton_unsmoothed_null(self, spark):
        rows = [(1, "a", 2.0), (2, "b", 3.0), (3, "b", 4.0)]
        got = _run(spark, rows, m=0)
        assert got[1].encoded is None
        assert got[2].encoded is not None


class TestContracts:
    def test_null_rows_excluded(self, spark):
        rows = [(1, "a", 1.0), (2, None, 2.0), (None, "a", 3.0), (4, "a", None)]
        got = _run(spark, rows, m=1)
        assert set(got) == {1}

    def test_empty(self, spark):
        assert _run(spark, []) == {}

    def test_validation(self, spark):
        from kinesis_stream_spark.operators.encoding import target_encoding

        with pytest.raises(ValueError, match="smoothing"):
            target_encoding(
                _df(spark, []),
                id_col="id",
                category_col="cat",
                target_col="y",
                smoothing=-1,
            )

    def test_partition_invariance(self, spark):
        from kinesis_stream_spark.operators.encoding import target_encoding

        rows = [
            (i, f"c{i % 5}", float((i * 7) % 13)) for i in range(60)
        ]
        kw = dict(
            id_col="id", category_col="cat", target_col="y", smoothing=3
        )
        base = sorted(map(str, target_encoding(_df(spark, rows), **kw).collect()))
        re9 = sorted(
            map(
                str,
                target_encoding(_df(spark, rows).repartition(9), **kw).collect(),
            )
        )
        assert re9 == base
