"""Prefix-filtering exact set-similarity join (operators/setjoin.py):
completeness vs a brute-force Jaccard ground truth (the property LSH
lacks), DuckDB parity on the same frame, and the no-cartesian plan pin."""

from __future__ import annotations

import itertools

import duckdb
import pandas as pd
import pytest

from kinesis_stream_spark.operators.setjoin import (
    prefix_filter_jaccard_pairs,
    sql_prefix_filter_jaccard_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy dog"),          # near-copy of 1
    (3, "the quick brown fox jumps over a sleepy cat instead"),  # mid overlap
    (4, "completely different text with no shared phrases here"),
    (5, "completely different text with no shared phrases"),     # near-copy of 4
    (6, "one two three four five six seven eight nine ten"),
    (7, "short text"),
    (8, "short text"),                                           # identical to 7
]


def _shingle_set(text, n=3):
    toks = text.split()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _truth(docs, threshold, n=3):
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        a, b = _shingle_set(ta, n), _shingle_set(tb, n)
        j = len(a & b) / len(a | b)
        if j >= threshold:
            out[(min(ia, ib), max(ia, ib))] = j
    return out


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8, 1.0])
def test_matches_bruteforce_truth(spark, threshold):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_jaccard_pairs(df, threshold=threshold).collect()
    }
    want = _truth(DOCS, threshold)
    assert set(got) == set(want), (threshold, got, want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-12


def test_duckdb_parity_on_fixture():
    con = duckdb.connect()
    try:
        con.register("fixture", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
        rows = con.execute(
            sql_prefix_filter_jaccard_pairs(
                "SELECT doc_id, text FROM fixture", threshold=0.5
            )
        ).fetchall()
        got = {(a, b): j for a, b, j in rows}
        want = _truth(DOCS, 0.5)
        assert set(got) == set(want)
        for k in got:
            assert abs(got[k] - want[k]) < 1e-12
    finally:
        con.close()


def test_empty_and_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert prefix_filter_jaccard_pairs(empty).count() == 0
    # single doc: no pairs; NULL text: dropped by the empty-set guard
    one = spark.createDataFrame([(1, "a b c d"), (2, None)], "doc_id long, text string")
    assert prefix_filter_jaccard_pairs(one).count() == 0


def test_plan_has_no_cartesian(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        prefix_filter_jaccard_pairs(df, threshold=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_prefix_filter_keeps_exact_boundary_containment_pair(spark):
    """Containment pair at EXACTLY J = t must be emitted: 28 shingles
    fully inside 35 gives J = 28/35 = 0.8; a separately-rounded
    positional threshold (ceil of a float alpha) silently dropped it
    — the bound must be tested with the final filter's arithmetic."""
    words_small = [f"w{i:03d}" for i in range(30)]   # 28 3-shingles
    words_big = [f"w{i:03d}" for i in range(37)]     # 35 3-shingles
    docs = spark.createDataFrame(
        [(1, " ".join(words_small)), (2, " ".join(words_big))],
        "doc_id long, text string",
    )
    rows = prefix_filter_jaccard_pairs(docs, threshold=0.8).collect()
    assert len(rows) == 1
    assert rows[0].jaccard == 28.0 / 35.0
