"""FD profiler (operators/profile.py), key-concentration deciles
(operators/skew.py), and phrase search (operators/retrieval.py) against
hand-built fixtures. Cross-engine parity for the registered queries
runs in test_oracle_parity.py."""

from __future__ import annotations

import pytest

from kinesis_stream_spark.operators.profile import fd_profile
from kinesis_stream_spark.operators.retrieval import phrase_search
from kinesis_stream_spark.operators.skew import key_concentration_deciles


def test_fd_profile_holds_and_violates(spark):
    df = spark.createDataFrame(
        [(1, "x", "p"), (2, "x", "p"), (3, "y", "q"), (3, "y", "r")],
        "k long, a string, b string",
    )
    got = {
        (r.determinant, r.dependent): (
            r.n_groups, r.n_violating_groups, r.max_dependents, r.fd_holds
        )
        for r in fd_profile(df, [("a", "b"), ("k", "a"), ("a", "k")]).collect()
    }
    # a->b: x->{p}, y->{q,r} -> one violation
    assert got[("a", "b")] == (2, 1, 2, False)
    # k->a holds (1->x, 2->x, 3->y)
    assert got[("k", "a")] == (3, 0, 1, True)
    # a->k: x->{1,2} violates
    assert got[("a", "k")] == (2, 1, 2, False)
    with pytest.raises(ValueError):
        fd_profile(df, [])


def test_fd_profile_empty_relation_holds_vacuously(spark):
    """On an empty relation the FD holds vacuously: n_violating_groups
    must be 0 and fd_holds TRUE — not NULL (SUM over zero groups)."""
    df = spark.createDataFrame([], "k long, a string, b string")
    r = fd_profile(df, [("a", "b")]).collect()[0]
    assert r.n_groups == 0
    assert r.n_violating_groups == 0
    assert r.fd_holds is True


def test_key_concentration_deciles_uniform_and_hot(spark):
    # 10 keys: key 0 has 91 rows, keys 1..9 have 1 row each -> 100 rows
    rows = [(0,)] * 91 + [(k,) for k in range(1, 10)]
    df = spark.createDataFrame(rows, "key long")
    got = {r.decile: r for r in key_concentration_deciles(df, "key").collect()}
    assert len(got) == 10  # 10 keys, 10 bands of one key each
    assert got[0].band_rows == 91 and got[0].cum_share_ppm == 910000
    assert got[9].cum_rows == 100 and got[9].cum_share_ppm == 1000000
    with pytest.raises(ValueError):
        key_concentration_deciles(df, "key", buckets=0)


def test_phrase_search_consecutive_only(spark):
    docs = spark.createDataFrame(
        [
            (1, "slow query runs here"),
            (2, "slow red query"),          # not consecutive
            (3, "the slow query slow query"),  # two occurrences
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.phrase: r for r in phrase_search(docs, ["slow query", "red query"]).collect()}
    assert got["slow query"].n_docs == 2
    assert got["slow query"].n_occurrences == 3
    assert got["slow query"].sample_doc_id == 1
    assert got["red query"].n_docs == 1 and got["red query"].sample_doc_id == 2
    with pytest.raises(ValueError):
        phrase_search(docs, [])


def test_phrase_search_no_match_emits_no_row(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert phrase_search(docs, ["z z"]).count() == 0
