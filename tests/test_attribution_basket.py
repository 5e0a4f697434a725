"""Hand-traced semantics for the round-9 batch: first/last-touch
attribution, item-item basket Jaccard, TWA, and state durations —
the oracle parity suite covers the events/lineitem tables; these pin
boundary behavior (lookback edges, censoring, ties, degenerate keys)
on fixtures built to hit it."""

from __future__ import annotations

import datetime as dt


def _t(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def test_first_last_touch_window_and_ties(spark):
    from kinesis_stream_spark.operators.attribution import first_last_touch

    rows = [
        # user 1: view@1h, click@2h, purchase@3h -> first=view, last=click
        (1, 1, "view", _t(1), 0.0),
        (2, 1, "click", _t(2), 0.0),
        (3, 1, "purchase", _t(3), 100.0),
        # user 2: touch EXACTLY at conversion instant counts (<=)
        (10, 2, "signup", _t(5), 0.0),
        (11, 2, "purchase", _t(5), 40.0),
        # user 3: touch outside the lookback -> organic, no row
        (20, 3, "view", _t(1), 0.0),
        (21, 3, "purchase", dt.datetime(2024, 1, 9), 7.0),
        # user 4: two touches same instant -> event_id breaks the tie
        (30, 4, "view", _t(8), 0.0),
        (31, 4, "click", _t(8), 0.0),
        (32, 4, "purchase", _t(9), 10.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    )
    out = {r.touch_type: r for r in first_last_touch(ev).collect()}
    assert out["view"].first_touch_convs == 2  # users 1 and 4
    assert out["view"].last_touch_convs == 0
    assert out["click"].first_touch_convs == 0
    assert out["click"].last_touch_convs == 2  # users 1 and 4
    assert out["signup"].first_touch_convs == 1
    assert out["signup"].last_touch_convs == 1
    assert out["view"].first_touch_value == 110.0  # 100 + 10
    assert out["click"].last_touch_value == 110.0
    assert out["signup"].last_touch_value == 40.0


def test_first_last_touch_same_touch_credits_both_models(spark):
    from kinesis_stream_spark.operators.attribution import first_last_touch

    ev = spark.createDataFrame(
        [
            (1, 1, "click", _t(1), 0.0),
            (2, 1, "purchase", _t(2), 9.0),
        ],
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    )
    out = first_last_touch(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.first_touch_convs, r.last_touch_convs) == (1, 1)
    assert (r.first_touch_value, r.last_touch_value) == (9.0, 9.0)


def test_item_jaccard_hand_computed(spark):
    from kinesis_stream_spark.operators.basket import item_jaccard

    rows = [
        (1, "a"), (1, "b"), (1, "b"),  # dup (1,b) collapses
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "a"),
    ]
    bi = spark.createDataFrame(rows, "basket long, item string")
    out = {(r.item_a, r.item_b): r for r in
           item_jaccard(bi, min_common=1, top_k=10).collect()}
    # deg: a=4, b=2, c=1; common: (a,b)=2, (a,c)=1
    ab = out[("a", "b")]
    assert (ab.common, ab.deg_a, ab.deg_b) == (2, 4, 2)
    assert ab.jaccard == 2 / 4  # 2/(4+2-2)
    ac = out[("a", "c")]
    assert ac.jaccard == 1 / 4
    assert ("b", "c") not in out  # no shared basket
    # min_common prunes before ranking
    assert set(
        (r.item_a, r.item_b)
        for r in item_jaccard(bi, min_common=2, top_k=10).collect()
    ) == {("a", "b")}


def test_time_weighted_avg_locf_hand_computed(spark):
    from kinesis_stream_spark.operators.temporal import time_weighted_avg

    rows = [
        # key a: v=10 holds 1h, v=30 holds 3h, last point open
        (1, "a", _t(0), 10.0),
        (2, "a", _t(1), 30.0),
        (3, "a", _t(4), 999.0),
        # key b: single point -> zero span, NULL twa
        (4, "b", _t(0), 5.0),
        # NULL ts and NULL value excluded
        (5, "a", None, 1e9),
        (6, "a", _t(2), None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    out = {r.key: r for r in time_weighted_avg(ev).collect()}
    a = out["a"]
    # twa = (10*1h + 30*3h) / 4h = 100/4 = 25
    assert a.n_points == 3 and a.twa == 25.0
    assert a.dur_us == 4 * 3600 * 1_000_000
    b = out["b"]
    assert b.n_points == 1 and b.twa is None and b.dur_us == 0


def test_state_durations_censors_last_event(spark):
    from kinesis_stream_spark.operators.temporal import state_durations

    rows = [
        # user 1: A for 1h, B for 2h, A open (censored)
        (1, 1, "A", _t(0)),
        (2, 1, "B", _t(1)),
        (3, 1, "A", _t(3)),
        # user 2: only one event -> fully censored, contributes nothing
        (4, 2, "B", _t(0)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r.state: r for r in state_durations(ev).collect()}
    h = 3600 * 1_000_000
    assert out["A"].total_us == 1 * h and out["A"].n_intervals == 1
    assert out["B"].total_us == 2 * h and out["B"].n_intervals == 1
    assert out["A"].share_ppm == 333_333  # floor(1e6/3)
    assert out["B"].share_ppm == 666_666


def test_abc_classification_hand_traced(spark):
    """Revenue 50/30/15/5 over four keys: cumulative shares 50/80/95/
    100 percent -> classes A, A (<=80 inclusive), B (<=95 inclusive),
    C."""
    from kinesis_stream_spark.operators.skew import abc_classification

    rows = [("k1", 50.0), ("k2", 30.0), ("k3", 15.0), ("k4", 5.0)]
    df = spark.createDataFrame(rows, "pk string, v double")
    out = {r.key: r for r in abc_classification(
        df, key_col="pk", value_expr="v"
    ).collect()}
    assert {k: r.abc_class for k, r in out.items()} == {
        "k1": "A", "k2": "A", "k3": "B", "k4": "C",
    }
    assert out["k2"].cum_ppm == 800_000
    assert out["k3"].cum_ppm == 950_000
    assert out["k1"].revenue_u == 50_000_000


def test_rfm_scores_order_and_inversion(spark):
    """Five users with strictly increasing frequency/monetary and
    strictly DECREASING recency-goodness: f/m scores run 1..5 and the
    most recent purchaser gets r_score 5."""
    from kinesis_stream_spark.operators.temporal import rfm_segments

    rows = []
    eid = 0
    for u in range(1, 6):
        # user u: u purchases, value 10*u each, last on day u
        for k in range(u):
            eid += 1
            rows.append(
                (eid, u, "purchase",
                 dt.datetime(2024, 1, u, 12) - dt.timedelta(hours=k),
                 10.0 * u)
            )
    # noise rows of another type are ignored
    rows.append((999, 1, "view", dt.datetime(2024, 1, 28), 1e9))
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    )
    out = {r.user_id: r for r in rfm_segments(ev).collect()}
    assert [out[u].f_score for u in range(1, 6)] == [1, 2, 3, 4, 5]
    assert [out[u].m_score for u in range(1, 6)] == [1, 2, 3, 4, 5]
    # user 5 purchased last -> recency 0 -> best score
    assert out[5].recency_us == 0 and out[5].r_score == 5
    assert out[1].r_score == 1


def test_conversion_lag_histogram_buckets_and_organic(spark):
    from kinesis_stream_spark.operators.attribution import (
        conversion_lag_histogram,
    )

    rows = [
        # user 1: touch at 1h, convert at 3h30 -> lag 2.5h -> bucket 2
        (1, 1, "view", _t(1)),
        (2, 1, "purchase", _t(3, 30)),
        # user 2: organic (no touch in 7d window)
        (10, 2, "purchase", _t(5)),
        # user 3: touch same instant -> lag 0 -> bucket 0
        (20, 3, "click", _t(7)),
        (21, 3, "purchase", _t(7)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r.lag_bucket: r.n_conversions
           for r in conversion_lag_histogram(ev).collect()}
    assert out == {2: 1, -1: 1, 0: 1}


def test_conversion_lag_counts_same_instant_duplicate_purchases(spark):
    """Two purchases by one user at the SAME microsecond are two
    conversions (review repro: the oracle's id-less GROUP BY used to
    collapse them to one)."""
    from kinesis_stream_spark.operators.attribution import (
        conversion_lag_histogram,
    )

    ev = spark.createDataFrame(
        [
            (1, 1, "view", _t(1)),
            (2, 1, "purchase", _t(3)),
            (3, 1, "purchase", _t(3)),
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    out = {r.lag_bucket: r.n_conversions
           for r in conversion_lag_histogram(ev).collect()}
    assert out == {2: 2}


def test_abc_grand_total_survives_negative_revenue_keys(spark):
    """A net-negative key (refunds) puts the running sum's peak before
    the end: the grand total must be SUM, not the running max (review
    repro: max(cum_u) misclassified every key)."""
    from kinesis_stream_spark.operators.skew import abc_classification

    rows = [("a", 100.0), ("b", 50.0), ("c", -30.0)]
    df = spark.createDataFrame(rows, "pk string, v double")
    out = {r.key: r for r in abc_classification(
        df, key_col="pk", value_expr="v"
    ).collect()}
    # grand = 120: cum shares a=83.3% (B), b=125% (C), c=100% (C)
    assert {k: r.abc_class for k, r in out.items()} == {
        "a": "B", "b": "C", "c": "C",
    }
    assert out["c"].cum_ppm == 1_000_000
