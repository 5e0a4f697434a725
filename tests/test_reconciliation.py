"""Unit tests for cross-table total reconciliation — every bucket
hand-constructed, tolerance edge, clamp form, contracts, partition
invariance."""

from __future__ import annotations

import pytest

FX = 1 << 20


def _frames(spark):
    parent = spark.createDataFrame(
        [
            (1, 10.0),    # matches exactly
            (2, 10.0),    # children sum to 9.0 -> mismatch
            (3, 5.0),     # no children -> missing_children
            (5, None),    # NULL total -> excluded
        ],
        "k long, total double",
    )
    children = spark.createDataFrame(
        [
            (1, 4.0), (1, 6.0),
            (2, 9.0),
            (4, 2.0),     # parent 4 absent -> orphan_children
            (None, 7.0),  # NULL key -> excluded
            (2, None),    # NULL contribution -> excluded
        ],
        "k long, contrib double",
    )
    return parent, children


def _run(spark, tolerance_fx=0):
    from kinesis_stream_spark.operators.profile import total_reconciliation

    parent, children = _frames(spark)
    rows = total_reconciliation(
        parent,
        children,
        parent_key="k",
        total_col="total",
        child_key="k",
        contribution_col="contrib",
        tolerance_fx=tolerance_fx,
    ).collect()
    return {r.bucket: r for r in rows}


class TestBuckets:
    def test_all_four_buckets(self, spark):
        got = _run(spark)
        assert set(got) == {
            "match", "mismatch", "missing_children", "orphan_children"
        }
        assert got["match"].n_keys == 1
        assert got["match"].total_abs_diff_fx == 0
        m = got["mismatch"]
        assert m.n_keys == 1
        assert m.total_abs_diff_fx == 1 * FX  # |10 - 9| in fx
        assert m.max_abs_diff_fx == 1 * FX
        assert got["missing_children"].total_abs_diff_fx == 5 * FX
        assert got["orphan_children"].total_abs_diff_fx == 2 * FX

    def test_tolerance_absorbs(self, spark):
        got = _run(spark, tolerance_fx=2 * FX)
        assert got["match"].n_keys == 2
        assert "mismatch" not in got

    def test_validation(self, spark):
        from kinesis_stream_spark.operators.profile import (
            total_reconciliation,
        )

        parent, children = _frames(spark)
        with pytest.raises(ValueError, match="tolerance_fx"):
            total_reconciliation(
                parent, children,
                parent_key="k", total_col="total",
                child_key="k", contribution_col="contrib",
                tolerance_fx=-1,
            )

    def test_empty_both_sides(self, spark):
        from kinesis_stream_spark.operators.profile import (
            total_reconciliation,
        )

        parent, children = _frames(spark)
        out = total_reconciliation(
            parent.where("k < 0"),
            children.where("k < 0"),
            parent_key="k", total_col="total",
            child_key="k", contribution_col="contrib",
        ).collect()
        assert out == []

    def test_partition_invariance(self, spark):
        from kinesis_stream_spark.operators.profile import (
            total_reconciliation,
        )

        parent, children = _frames(spark)
        kw = dict(
            parent_key="k", total_col="total",
            child_key="k", contribution_col="contrib",
        )
        base = sorted(
            map(str, total_reconciliation(parent, children, **kw).collect())
        )
        rep = sorted(
            map(
                str,
                total_reconciliation(
                    parent.repartition(5), children.repartition(7), **kw
                ).collect(),
            )
        )
        assert rep == base
