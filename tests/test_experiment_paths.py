"""Weighted cheapest path (operators/graph.py), A/B two-proportion
z-test (operators/experiment.py), and bigram novelty
(operators/text.py) against hand-built fixtures / Python references.
Cross-engine parity for the registered queries runs in
test_oracle_parity.py."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from kinesis_stream_spark.functions.hashing import md5_int64
from kinesis_stream_spark.operators.experiment import ab_conversion_ztest
from kinesis_stream_spark.operators.graph import cheapest_path
from kinesis_stream_spark.operators.text import bigram_novelty


def _edges(spark, triples):
    return spark.createDataFrame(
        [(str(a), str(b), int(w)) for a, b, w in triples],
        "src string, dst string, w long",
    )


def _seeds(spark, nodes):
    return spark.createDataFrame([(str(n),) for n in nodes], "node string")


def test_cheapest_path_prefers_cheap_detour(spark):
    """a-b costs 10 direct but 3 via c (2+1): with 2 rounds the detour
    wins; with 1 round only the direct edge is reachable at 10."""
    e = _edges(spark, [("a", "b", 10), ("a", "c", 2), ("c", "b", 1)])
    two = {r.node: r.cost for r in cheapest_path(e, _seeds(spark, ["a"]), rounds=2).collect()}
    assert two == {"a": 0, "b": 3, "c": 2}
    one = {r.node: r.cost for r in cheapest_path(e, _seeds(spark, ["a"]), rounds=1).collect()}
    assert one == {"a": 0, "b": 10, "c": 2}


def test_cheapest_path_parallel_edges_collapse_to_min(spark):
    e = _edges(spark, [("a", "b", 7), ("a", "b", 4), ("b", "a", 9)])
    got = {r.node: r.cost for r in cheapest_path(e, _seeds(spark, ["a"]), rounds=1).collect()}
    assert got == {"a": 0, "b": 4}  # min over the three parallel edges


def test_cheapest_path_multi_source_and_unreached(spark):
    e = _edges(spark, [("a", "b", 5), ("c", "d", 1), ("x", "y", 2)])
    got = {
        r.node: r.cost
        for r in cheapest_path(e, _seeds(spark, ["a", "c"]), rounds=3).collect()
    }
    # x/y unreachable -> absent; both components relax from their seed
    assert got == {"a": 0, "b": 5, "c": 0, "d": 1}
    with pytest.raises(ValueError):
        cheapest_path(e, _seeds(spark, ["a"]), rounds=0)


def test_ab_ztest_matches_python_reference(spark):
    """Replay the exact pinned arithmetic in Python on the same
    deterministic md5 split."""
    rows = [(u, "buy") for u in range(40)] + [(u, "view") for u in range(100)]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {r.metric: r for r in ab_conversion_ztest(df).collect()}
    # rebuild the split exactly as the operator does
    sdf = spark.createDataFrame([(u,) for u in range(100)], "u long")
    variants = {
        r.u: r.v
        for r in sdf.select(
            "u", (md5_int64(F.col("u").cast("string")) % 2).alias("v")
        ).collect()
    }
    n_c = sum(1 for v in variants.values() if v == 0)
    n_t = 100 - n_c
    c_c = sum(1 for u in range(40) if variants[u] == 0)
    c_t = 40 - c_c
    r = got["buy"]
    assert (r.n_control, r.n_treatment) == (n_c, n_t)
    assert (r.conv_control, r.conv_treatment) == (c_c, c_t)
    p_c, p_t = c_c / n_c, c_t / n_t
    pooled = (c_c + c_t) / 100.0
    se = math.sqrt(pooled * (1.0 - pooled) * (1.0 / n_c + 1.0 / n_t))
    assert r.z_score == pytest.approx((p_t - p_c) / se, rel=1e-12)
    # 100% converting metric -> degenerate pooled rate -> NULL z
    assert got["view"].z_score is None
    assert got["view"].conv_control == n_c and got["view"].conv_treatment == n_t


def test_ab_ztest_excludes_null_units(spark):
    rows = [(1, "buy"), (2, "buy"), (None, "buy")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    r = ab_conversion_ztest(df).collect()[0]
    assert r.n_control + r.n_treatment == 2


def test_bigram_novelty_counts_shared_vs_unique(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),   # bigrams: the-quick, quick-brown, brown-fox
            (2, "the quick red fox"),     # shares "the quick"
            (3, None),                    # no row
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_novelty(docs).collect()}
    assert set(got) == {1, 2}
    # doc 1: "the quick" df=2 (shared), other two df=1 -> 2 novel of 3
    assert got[1].n_bigrams == 3 and got[1].n_novel == 2
    assert got[1].novelty_ppm == 2 * 1_000_000 // 3
    assert got[2].n_novel == 2
    with pytest.raises(ValueError):
        bigram_novelty(docs, min_df=0)


def test_bigram_novelty_short_doc_pseudo_gram(spark):
    """A one-token doc contributes its whole text as a single
    pseudo-gram (the shingles() contract) — df counting still works."""
    docs = spark.createDataFrame(
        [(1, "hello"), (2, "hello")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in bigram_novelty(docs).collect()}
    assert got[1].n_bigrams == 1 and got[1].n_novel == 0  # df = 2
