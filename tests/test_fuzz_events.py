"""Fuzz-parity for the events-table queries: the synthetic events table
has no NULLs and few exact timestamp ties, so the temporal operators'
NULL/tie behavior is otherwise unexercised. This corpus forces NULL
values, NULL timestamps, duplicate (user, ts) pairs, and extreme
values, and checks Spark vs the DuckDB oracle on identical data."""

from __future__ import annotations

import datetime as dt
import os
import random

import duckdb
import pandas as pd
import pytest

EVENT_QUERIES = [
    "events_gap_fill_hourly",
    "events_scd2_status_history",
    "events_multires_rollup",
    "events_mad_outliers",
    "events_cohort_retention",
    "stream_capped_sessions",
    # lag-chain ordering under exact-tie timestamps and NULL ts
    "events_transition_matrix",
    # NULL-gated clamp + percentile fit over NULL/extreme values
    "events_winsorized_stats",
    # two-level count fold + DECIMAL Σc² over ties/NULL ts (ts-independent,
    # but the corpus exercises per-user single-category degenerate rows)
    "events_user_diversity",
    # round 10: NULL-sum occupied buckets must interpolate identically
    # (struct-carried neighbors), and NULL-bucket rows drop on both sides
    "events_linear_interpolation",
    # clamp-then-bin over extreme (1e6) and negative values + NULL
    # value/ts exclusion
    "profile_hellinger_drift",
    # no numerator events in this corpus: x = 0 everywhere -> both
    # delta variances 0 -> NULL z, identically on both engines
    "events_ab_delta_ratio",
    # NULL/zero/negative weights excluded; 1e6 weight exercises the
    # wfx headroom; NULL ids carry no draw
    "sample_weighted_per_type",
    # round 11: calendar-gap lags (sparse fuzz days), negative/extreme
    # value MAEs, NULL next-forecast slots
    "events_seasonal_naive_forecast",
    # round 11: distinct-unit counting under duplicate/NULL ids
    "events_ab_srm_check",
    # round 11: all fuzz events are post-split -> var(X)=0 -> theta=0
    # degenerate path, identically on both engines
    "events_ab_cuped",
    # round 11: NULL ids/values drop from the resample; negative and
    # 1e6 values ride the fx floor through the replicate sums
    "events_bootstrap_ci",
    # round 11: over-window gaps and quiet days on the sparse grid
    "events_rolling_distinct",
    # round 11: the fuzz corpus has no 'purchase' events -> empty left
    # side must yield an empty frame on BOTH engines
    "join_asof_error_before_purchase",
    # round 12: forward direction with an EMPTY right side (no
    # purchases) — every error must survive left-outer with NULL
    # asof columns, identically
    "join_asof_next_purchase_after_error",
    # round 12: batch twin of the streaming as-of enrichment — clicks
    # with no matchable purchases + NULL id/ts exclusions
    "stream_asof_enrich",
    # round 12: NULL values/event types excluded; negative values
    # clamp to p=0, 1e6 rides the [0,1] clamp into the last bin; no
    # 'purchase' -> frac_pos = 0 in every bin and ECE = mean_pred
    "events_calibration_bins",
]


def _corpus() -> pd.DataFrame:
    rng = random.Random(17)
    base = dt.datetime(2024, 2, 1)
    rows = []
    eid = 0
    for _ in range(300):
        ts = base + dt.timedelta(minutes=rng.randint(0, 5000))
        rows.append(
            (
                eid,
                ts,
                rng.randint(1, 6),
                rng.choice(["click", "view", "error"]),
                rng.choice([None, 0.0, -5.25, 1e6, rng.uniform(0, 100)]),
                "{}",
            )
        )
        eid += 1
    # exact-tie timestamps for one user (ordering tiebreaks), and NULL ts
    tie = base + dt.timedelta(minutes=99)
    for et in ("click", "view", "error"):
        rows.append((eid, tie, 1, et, 1.0, "{}"))
        eid += 1
    rows.append((eid, None, 2, "click", 3.0, "{}"))
    eid += 1
    rows.append((eid, None, 2, "view", None, "{}"))
    eid += 1
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


@pytest.fixture(scope="module")
def fuzz_ev_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("fuzz_ev"))
    _corpus().to_parquet(os.path.join(d, "events.parquet"))
    return d


@pytest.fixture(scope="module")
def fuzz_ev_con(fuzz_ev_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{fuzz_ev_dir}/events.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_fuzz_events_parity(spark, fuzz_ev_dir, fuzz_ev_con, name):
    from kinesis_stream_spark.queries import all_oracle_sql, all_queries

    s = all_queries()[name](spark, fuzz_ev_dir).toPandas()
    o = fuzz_ev_con.execute(all_oracle_sql()[name]).fetchdf()
    assert sorted(s.columns) == sorted(o.columns), name
    assert len(s) == len(o), (name, len(s), len(o))
    cols = sorted(s.columns)
    sc = s[cols].astype(str).sort_values(cols).reset_index(drop=True)
    oc = o[cols].astype(str).sort_values(cols).reset_index(drop=True)
    bad = (sc != oc).any(axis=1)
    assert not bad.any(), (name, sc[bad].head(3), oc[bad].head(3))


def test_transition_matrix_null_event_id_tie_parity(spark, tmp_path):
    # a NULL event_id under an exact timestamp tie: Spark's default sort
    # places NULLs FIRST, DuckDB's places them LAST — the lag chain
    # silently diverges unless both sides pin NULLS LAST (they do; this
    # corpus is the regression trap). Only ONE null-id row per tie:
    # two would be a genuinely undefined order on both engines.
    base = dt.datetime(2024, 3, 1)
    tie = base + dt.timedelta(hours=1)
    rows = [
        (0, base, 1, "view", 1.0, "{}"),
        (1, tie, 1, "click", 1.0, "{}"),
        (2, tie, 1, "error", 1.0, "{}"),
        (None, tie, 1, "view", 1.0, "{}"),  # must sort AFTER ids 1 and 2
        (3, tie + dt.timedelta(hours=1), 1, "click", 1.0, "{}"),
        (4, base, 2, "click", 1.0, "{}"),
        (None, base + dt.timedelta(minutes=5), 2, "error", 1.0, "{}"),
        (5, base + dt.timedelta(minutes=9), 2, "view", 1.0, "{}"),
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["event_id"] = df["event_id"].astype("Int64")
    d = str(tmp_path)
    df.to_parquet(os.path.join(d, "events.parquet"))

    from kinesis_stream_spark.queries import all_oracle_sql, all_queries

    s = (
        all_queries()["events_transition_matrix"](spark, d)
        .toPandas()
        .sort_values(["from_state", "to_state"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    o = con.execute(all_oracle_sql()["events_transition_matrix"]).fetchdf()
    con.close()
    cols = sorted(s.columns)
    assert s[cols].astype(str).equals(
        o.sort_values(["from_state", "to_state"]).reset_index(drop=True)[cols].astype(str)
    )
    # the null-id row resolves the user-1 tie chain as
    # view→click→error→view→click; user 2 contributes click→error→view
    got = {
        (r.from_state, r.to_state): r.n_transitions for r in s.itertuples()
    }
    assert got == {
        ("view", "click"): 2,
        ("click", "error"): 2,
        ("error", "view"): 2,
    }
