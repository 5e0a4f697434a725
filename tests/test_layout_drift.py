"""Hand-traced semantics for ACF, burstiness, the Morton layout
census, and vocabulary drift — boundary behavior the parity corpus
may not exercise (perfect regularity, alternating series, known bit
patterns, hand-counted shares)."""

from __future__ import annotations

import datetime as dt


def _t(d, h=0):
    return dt.datetime(2024, 1, d, h)


def test_autocorrelation_alternating_and_constant(spark):
    from kinesis_stream_spark.operators.temporal import autocorrelation

    rows = []
    # key "alt": daily values 1,5,1,5,... -> lag1 r = -1, lag2 r = +1
    for d in range(1, 9):
        rows.append((d, "alt", _t(d), 1.0 if d % 2 else 5.0))
    # key "flat": constant series -> zero variance -> NULL r
    for d in range(1, 6):
        rows.append((100 + d, "flat", _t(d), 3.0))
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    got = {(r.key, r.lag): r for r in
           autocorrelation(ev, max_lag=2).collect()}
    assert abs(got[("alt", 1)].r - (-1.0)) < 1e-12
    assert abs(got[("alt", 2)].r - 1.0) < 1e-12
    assert got[("alt", 1)].n_pairs == 7 and got[("alt", 2)].n_pairs == 6
    assert got[("flat", 1)].r is None and got[("flat", 2)].r is None


def test_burstiness_regular_stream_is_minus_one(spark):
    from kinesis_stream_spark.operators.temporal import (
        interarrival_burstiness,
    )

    rows = [(i, "metronome", _t(1) + dt.timedelta(hours=i)) for i in range(10)]
    # bursty: 8 events in one second, then one a week later
    rows += [(100 + i, "bursty", _t(1) + dt.timedelta(seconds=i // 8))
             for i in range(8)]
    rows += [(200, "bursty", _t(8))]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    got = {r.key: r for r in interarrival_burstiness(ev).collect()}
    m = got["metronome"]
    assert m.n_gaps == 9 and m.cv == 0.0 and m.burstiness == -1.0
    assert m.mean_gap_us == 3600.0 * 1e6
    b = got["bursty"]
    assert b.burstiness > 0.4  # strongly bursty (Poisson would be ~0)
    assert b.cv > 1.0
    # B and CV are the same statistic in different clothes:
    # B = (cv - 1) / (cv + 1)
    assert abs(b.burstiness - (b.cv - 1) / (b.cv + 1)) < 1e-12


def test_zorder_interleave_known_bits_and_rectangles(spark):
    from kinesis_stream_spark.operators.layout import (
        _interleave_expr,
        zorder_census,
    )

    # hand-checked Morton values
    df = spark.createDataFrame(
        [(1, 1), (3, 5), (50, 2000)], "x long, y long"
    )
    vals = [
        r.z for r in df.selectExpr(
            f"{_interleave_expr('x', 'y')} AS z"
        ).orderBy("z").collect()
    ]
    assert vals == [3, 39, 2795268]  # interleave(1,1)=0b11 etc.

    # census rectangles: a 4x4 grid bucketed by z div 4 gives four
    # 2x2 quadrant buckets — BOTH columns' extents are tight
    grid = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x long, y long"
    )
    out = {r.zbucket: r for r in
           zorder_census(grid, x_col="x", y_col="y", bucket_bits=2).collect()}
    assert len(out) == 4
    for r in out.values():
        assert r.n_rows == 4
        assert r.x_max - r.x_min == 1 and r.y_max - r.y_min == 1


def test_vocabulary_drift_hand_counted(spark):
    from kinesis_stream_spark.operators.text import vocabulary_drift

    docs = spark.createDataFrame(
        [
            (0, "apple apple banana"),   # half A (even ids)
            (2, "apple cherry"),         # half A
            (1, "banana banana banana"), # half B
            (3, "cherry"),               # half B
        ],
        "doc_id long, text string",
    )
    out = {r.token: r for r in vocabulary_drift(docs, top_k=10).collect()}
    # A totals 5 tokens: apple 3, banana 1, cherry 1
    # B totals 4 tokens: banana 3, cherry 1
    assert (out["apple"].cnt_a, out["apple"].cnt_b) == (3, 0)
    assert out["apple"].share_a_ppm == 600_000
    assert out["apple"].share_b_ppm == 0
    assert out["banana"].share_a_ppm == 200_000
    assert out["banana"].share_b_ppm == 750_000
    assert out["banana"].delta_ppm == -550_000
    assert out["cherry"].delta_ppm == 200_000 - 250_000
    # movers ordered by |delta| desc
    toks = [r.token for r in vocabulary_drift(docs, top_k=10).collect()]
    assert toks == ["apple", "banana", "cherry"]


def test_vocabulary_drift_empty_half_zero_shares(spark):
    """All-odd ids leave half A empty: shares for the empty half are 0
    by contract — no ANSI divide-by-zero on either engine."""
    from kinesis_stream_spark.operators.text import vocabulary_drift

    docs = spark.createDataFrame(
        [(1, "apple apple"), (3, "banana")], "doc_id long, text string"
    )
    out = {r.token: r for r in vocabulary_drift(docs, top_k=10).collect()}
    assert out["apple"].share_a_ppm == 0
    assert out["apple"].share_b_ppm == 666_666
    assert out["apple"].delta_ppm == -666_666


def test_state_durations_all_zero_dwell_null_share(spark):
    """Same-timestamp events give zero-length intervals everywhere:
    grand total 0 -> share_ppm NULL by contract, no ANSI crash."""
    import datetime as dt

    from kinesis_stream_spark.operators.temporal import state_durations

    t = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, 1, "A", t), (2, 1, "B", t)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    out = state_durations(ev).collect()
    assert len(out) == 1  # one closed zero-length interval (A -> B)
    assert out[0].total_us == 0 and out[0].share_ppm is None
