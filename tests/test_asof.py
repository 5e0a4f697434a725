"""Unit tests for the first-class AS-OF join (operators/asof.py) —
hand-computed fixtures for both directions, tolerance, ties, the
left-outer contract, null exclusions, partition invariance, and the
no-join plan pin. Cross-engine parity of the registered query is
covered by tests/test_oracle_parity.py."""

from __future__ import annotations

import datetime as dt

import pytest


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _t(10)),
            (2, "u1", _t(30)),
            (3, "u2", _t(5)),   # no right rows for u2 at/before
            (4, "u3", _t(0)),   # u3 has no right rows at all
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, "u1", _t(10), 1.0),   # equal-ts (inclusive bound)
            (101, "u1", _t(10), 2.0),   # tie: larger id wins
            (102, "u1", _t(25), 3.0),
            (103, "u1", _t(40), 4.0),
            (104, "u2", _t(50), 5.0),
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    return left, right


def _run(spark, direction="backward", tolerance_us=None):
    from kinesis_stream_spark.operators.asof import asof_join

    left, right = _frames(spark)
    out = asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_id="event_id",
        right_vals=("value",),
        direction=direction,
        tolerance_us=tolerance_us,
    )
    return {r.event_id: r for r in out.collect()}


class TestBackward:
    def test_hand_computed(self, spark):
        got = _run(spark)
        assert set(got) == {1, 2, 3, 4}
        # left 1 @10: ties at 10 -> id 101 wins (largest id)
        assert (got[1].asof_event_id, got[1].asof_value) == (101, 2.0)
        assert got[1].asof_ts == _t(10)
        # left 2 @30: nearest past is 102 @25
        assert (got[2].asof_event_id, got[2].asof_value) == (102, 3.0)
        # u2 @5: only right row is @50 (future) -> NULL
        assert got[3].asof_event_id is None and got[3].asof_value is None
        # u3: no right rows at all -> NULL (left-outer contract)
        assert got[4].asof_event_id is None

    def test_tolerance_nulls_stale_match(self, spark):
        got = _run(spark, tolerance_us=4 * 60 * 1_000_000)  # 4 minutes
        # left 2 @30 matched 102 @25 -> 5 min gap > 4 min -> NULLed
        assert got[2].asof_event_id is None
        # left 1 @10 matched at 0 gap -> kept
        assert got[1].asof_event_id == 101


class TestForward:
    def test_hand_computed(self, spark):
        got = _run(spark, direction="forward")
        # left 1 @10: equal-ts rows qualify (inclusive) -> 101 (max id)
        assert got[1].asof_event_id == 101
        # left 2 @30: nearest future is 103 @40
        assert (got[2].asof_event_id, got[2].asof_value) == (103, 4.0)
        # u2 @5: right @50 is in the future -> matches forward
        assert got[3].asof_event_id == 104
        assert got[4].asof_event_id is None

    def test_forward_tolerance(self, spark):
        got = _run(spark, direction="forward", tolerance_us=60_000_000)
        # u2 @5 -> @50 is 45 min away > 1 min -> NULLed
        assert got[3].asof_event_id is None


class TestContract:
    def test_null_key_and_ts_excluded(self, spark):
        from kinesis_stream_spark.operators.asof import asof_join

        left = spark.createDataFrame(
            [(1, None, _t(1)), (2, "u", None), (3, "u", _t(9))],
            "event_id long, user_id string, ts timestamp",
        )
        right = spark.createDataFrame(
            [(7, "u", _t(1), 1.0), (None, "u", _t(2), 9.0)],
            "event_id long, user_id string, ts timestamp, value double",
        )
        got = {
            r.event_id: r
            for r in asof_join(
                left,
                right,
                on="user_id",
                left_ts="ts",
                right_ts="ts",
                right_id="event_id",
                right_vals=("value",),
            ).collect()
        }
        # null-key / null-ts left rows drop; null-id right row ignored
        assert set(got) == {3}
        assert got[3].asof_event_id == 7

    def test_empty_sides(self, spark):
        from kinesis_stream_spark.operators.asof import asof_join

        left, right = _frames(spark)
        empty_r = right.where("event_id < 0")
        out = asof_join(
            left,
            empty_r,
            on="user_id",
            left_ts="ts",
            right_ts="ts",
            right_id="event_id",
            right_vals=("value",),
        )
        rows = out.collect()
        assert len(rows) == 4 and all(r.asof_event_id is None for r in rows)
        empty_l = left.where("event_id < 0")
        assert (
            asof_join(
                empty_l,
                right,
                on="user_id",
                left_ts="ts",
                right_ts="ts",
                right_id="event_id",
            ).collect()
            == []
        )

    def test_validation(self, spark):
        from kinesis_stream_spark.operators.asof import asof_join

        left, right = _frames(spark)
        with pytest.raises(ValueError, match="direction"):
            asof_join(
                left, right, on="user_id", left_ts="ts",
                right_ts="ts", right_id="event_id", direction="nearest",
            )
        with pytest.raises(ValueError, match="tolerance"):
            asof_join(
                left, right, on="user_id", left_ts="ts",
                right_ts="ts", right_id="event_id", tolerance_us=-1,
            )
        with pytest.raises(ValueError, match="asof output columns"):
            asof_join(
                left.withColumn("asof_event_id", F_lit0()),
                right, on="user_id", left_ts="ts",
                right_ts="ts", right_id="event_id",
            )

    def test_partition_invariance(self, spark):
        from kinesis_stream_spark.operators.asof import asof_join

        left, right = _frames(spark)
        base = sorted(
            map(str, _run(spark).values())
        )
        repart = asof_join(
            left.repartition(7),
            right.repartition(3),
            on="user_id",
            left_ts="ts",
            right_ts="ts",
            right_id="event_id",
            right_vals=("value",),
        )
        assert sorted(map(str, repart.collect())) == base


def F_lit0():
    from pyspark.sql import functions as F

    return F.lit(0).cast("long")


def test_plan_has_no_join_single_exchange(spark, sf_dir):
    """The scale contract: the union-window form joins NOTHING — one
    hash exchange on the key, one sort, one window; candidate pairs
    never materialize."""
    from kinesis_stream_spark.queries.temporal import QUERIES

    df = QUERIES["join_asof_error_before_purchase"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Join" not in plan  # no SortMergeJoin/BroadcastHashJoin/NLJ
    # exactly one hash exchange (the window's, on the key); the only
    # other exchange is the presentation orderBy's range partitioning
    assert plan.count("hashpartitioning(") == 1, plan
    assert "Window" in plan
    # the event_type filters reach the parquet scans on both sides
    assert "EqualTo(event_type,purchase)" in plan
    assert "EqualTo(event_type,error)" in plan
