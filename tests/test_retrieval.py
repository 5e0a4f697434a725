"""Sparse retrieval (operators/retrieval.py): BM25 and vocabulary
coverage against exact Python reference implementations (same IEEE op
order, same fixed-point floor), the distributed prefix sum against the
global-window definition, and empty/no-match edges. Cross-engine parity
for the registered queries runs in test_oracle_parity.py."""

from __future__ import annotations

import math
import random
import re

import pytest
from collections import Counter

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_stream_spark.operators.retrieval import (
    BM25_SCALE,
    bm25_topk,
    rsj_topk,
    vocab_coverage,
)
from kinesis_stream_spark.operators.skew import distributed_cumsum

_WS = re.compile(r"[ \t\n\x0B\f\r]+")

DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana banana durian"),
    (2, "apple cherry cherry cherry apple apple"),
    (3, "elderberry fig"),
    (4, ""),  # empty text tokenizes to [""] — must not crash or match
]

QUERIES = [
    (1, "apple cherry"),
    (2, "durian banana banana"),  # duplicate query term deduplicates
    (3, "missing"),  # no postings -> no rows for this query
]


def _toks(text: str) -> list[str]:
    return _WS.split(text)


def _bm25_truth(docs, queries, k=10):
    """Reference BM25: the exact arithmetic of bm25_topk — Python floats
    are the same IEEE doubles, left-assoc op order replicated."""
    toks = {d: _toks(t) for d, t in docs}
    n = len(docs)
    t_total = sum(len(v) for v in toks.values())
    out = {}
    for qid, qtext in queries:
        scores = Counter()
        for term in dict.fromkeys(_toks(qtext)):
            posting = {d: v.count(term) for d, v in toks.items() if term in v}
            df = len(posting)
            if not df:
                continue
            idf = float(2 * (n - df) + 1) / float(2 * df + 1)
            for d, tf in posting.items():
                wnum = 22.0 * t_total * tf
                wden = 10.0 * t_total * tf + 3.0 * t_total + 9.0 * len(toks[d]) * n
                scores[d] += math.floor(idf * (wnum / wden) * float(BM25_SCALE))
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for rank, (d, sfx) in enumerate(ranked, 1):
            out[(qid, d)] = (sfx / BM25_SCALE, rank)
    return out


def test_bm25_matches_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, qtext string")
    got = {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in bm25_topk(docs, qs, k=10).collect()
    }
    assert got == _bm25_truth(DOCS, QUERIES)
    # query 3 matched nothing; queries 1 and 2 produced rows
    assert {q for q, _ in got} == {1, 2}


def test_bm25_rare_term_outranks_common_at_equal_tf(spark):
    """idf must matter: one doc matching the corpus-rare term beats one
    matching the ubiquitous term at identical tf and length."""
    docs = [(i, "common filler") for i in range(9)] + [(9, "rare filler")]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    qs = spark.createDataFrame(
        [(1, "rare common")], "query_id long, qtext string"
    )
    rows = bm25_topk(sdf, qs, k=2).orderBy("rank").collect()
    assert rows[0].doc_id == 9 and rows[0].rank == 1
    assert rows[0].score > rows[1].score


def test_bm25_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    qs = spark.createDataFrame([(1, "apple")], "query_id long, qtext string")
    assert bm25_topk(docs, qs).count() == 0


def _rsj_truth(docs, queries, k=10):
    """Reference RSJ: idf-only, presence-based — same rational idf and
    floor-fx as the operator, no tf/length terms."""
    toks = {d: set(_toks(t)) for d, t in docs}
    n = len(docs)
    out = {}
    for qid, qtext in queries:
        scores = Counter()
        for term in dict.fromkeys(_toks(qtext)):
            matched = [d for d, v in toks.items() if term in v]
            df = len(matched)
            if not df:
                continue
            idf = float(2 * (n - df) + 1) / float(2 * df + 1)
            for d in matched:
                scores[d] += math.floor(idf * float(BM25_SCALE))
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for rank, (d, sfx) in enumerate(ranked, 1):
            out[(qid, d)] = (sfx / BM25_SCALE, rank)
    return out


def test_rsj_matches_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, qtext string")
    got = {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in rsj_topk(docs, qs, k=10).collect()
    }
    assert got == _rsj_truth(DOCS, QUERIES)
    assert {q for q, _ in got} == {1, 2}  # "missing" query yields no rows


def test_rsj_ignores_tf_and_length(spark):
    """Binary model: tf and doc length must NOT move the score — a doc
    repeating the term 5× in a long body ties a doc mentioning it once,
    and the tie breaks to the lower doc_id."""
    docs = [
        (3, "apple " * 5 + "pad " * 20),
        (7, "apple"),
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    qs = spark.createDataFrame([(1, "apple")], "query_id long, qtext string")
    rows = rsj_topk(sdf, qs, k=2).orderBy("rank").collect()
    assert rows[0].score == rows[1].score
    assert rows[0].doc_id == 3 and rows[1].doc_id == 7


def test_rsj_rare_term_dominates_many_common(spark):
    """idf-only: one rare-term match outranks a doc matching two
    ubiquitous query terms."""
    docs = [(i, "common filler extra") for i in range(9)] + [(9, "rare body")]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    qs = spark.createDataFrame(
        [(1, "rare common filler")], "query_id long, qtext string"
    )
    rows = rsj_topk(sdf, qs, k=1).collect()
    assert rows[0].doc_id == 9


def test_rsj_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    qs = spark.createDataFrame([(1, "apple")], "query_id long, qtext string")
    assert rsj_topk(docs, qs).count() == 0


def _vocab_truth(docs, thresholds=(50, 90, 99)):
    counts = Counter(t for _, text in docs for t in _toks(text))
    total = sum(counts.values())
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    rows = {}
    for pct in thresholds:
        cum = 0
        for i, (_, c) in enumerate(ordered, 1):
            cum += c
            if cum * 100 >= pct * total:
                rows[pct] = (i, cum, total, len(ordered), cum / total)
                break
    return rows


def test_vocab_coverage_matches_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.pct: (r.n_terms, r.covered_tokens, r.total_tokens, r.vocab_size, r.coverage)
        for r in vocab_coverage(docs).collect()
    }
    assert got == _vocab_truth(DOCS)


def test_vocab_coverage_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert vocab_coverage(docs).count() == 0


def test_distributed_cumsum_equals_global_window(spark):
    rng = random.Random(11)
    rows = [(i, rng.randint(0, 50)) for i in rng.sample(range(10_000), 500)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = distributed_cumsum(df, [F.col("k").asc()], "v", "cum", num_partitions=7)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.withColumn("cum", F.sum("v").over(w))
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_distributed_cumsums_two_sums_one_pass(spark):
    """rank + running total from ONE range exchange, matching the
    textbook global-window formulation of each."""
    from kinesis_stream_spark.operators.skew import distributed_cumsums

    rng = random.Random(23)
    rows = [(i, rng.randint(1, 40)) for i in rng.sample(range(5_000), 300)]
    df = spark.createDataFrame(rows, "k long, v long")
    order = [F.col("v").desc(), F.col("k").asc()]
    got = distributed_cumsums(
        df, order, [("v", "cum"), (F.lit(1), "rank")], num_partitions=6
    )
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("v").over(w)).withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_distributed_cumsums_rejects_empty_vals(spark):
    from kinesis_stream_spark.operators.skew import distributed_cumsums

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError):
        distributed_cumsums(df, [F.col("k")], [])


def test_distributed_cumsum_desc_composite_order(spark):
    """The vocab-coverage ordering shape: (count desc, term asc)."""
    rows = [(f"t{i:03d}", (i * 7) % 13) for i in range(200)]
    df = spark.createDataFrame(rows, "term string, n long")
    order = [F.col("n").desc(), F.col("term").asc()]
    got = distributed_cumsum(df, order, "n", "cum", num_partitions=5)
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("n").over(w))
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_rrf_fuse_matches_reference(spark):
    from kinesis_stream_spark.operators.retrieval import RRF_SCALE, rrf_fuse

    # two rankings with overlap, list-exclusive items, and a tie shape:
    # item 30 is rank 1 in B only; items 10/20 appear in both
    a = [(1, 10, 1), (1, 20, 2), (1, 40, 3), (2, 50, 1)]
    b = [(1, 30, 1), (1, 10, 2), (1, 20, 3)]
    sa = spark.createDataFrame(a, "query_id long, item_id long, rank long")
    sb = spark.createDataFrame(b, "query_id long, item_id long, rank long")
    got = {
        (r.query_id, r.item_id): (r.rrf_score, r.n_lists, r.fused_rank)
        for r in rrf_fuse([sa, sb], k=10).collect()
    }

    truth = {}
    for qid, item, rank in a + b:
        s, n = truth.get((qid, item), (0, 0))
        truth[(qid, item)] = (s + RRF_SCALE // (60 + rank), n + 1)
    want = {}
    for qid in {1, 2}:
        items = sorted(
            ((k_, v) for k_, v in truth.items() if k_[0] == qid),
            key=lambda kv: (-kv[1][0], kv[0][1]),
        )
        for fr, ((_, item), (sfx, n)) in enumerate(items, 1):
            want[(qid, item)] = (sfx / RRF_SCALE, n, fr)
    assert got == want
    # both-list consensus outranks the single-list rank-1: items 10
    # (1/61 + 1/62) and 20 (1/62 + 1/63) both beat item 30's lone 1/61
    assert got[(1, 10)][2] == 1 and got[(1, 20)][2] == 2
    assert got[(1, 30)][2] == 3 and got[(1, 30)][1] == 1


def test_rrf_fuse_empty_inputs(spark):
    from kinesis_stream_spark.operators.retrieval import rrf_fuse

    e = spark.createDataFrame([], "query_id long, item_id long, rank long")
    assert rrf_fuse([e, e]).count() == 0
