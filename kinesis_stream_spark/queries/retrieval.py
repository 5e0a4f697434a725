"""Sparse-retrieval query inventory (documents table; SURVEY.md §2.3
extension rows "BM25 sparse retrieval" and "vocabulary coverage").

The fixed query set mixes the corpus's one rare term ("dup", df ≈ 5%
of docs) with common terms (df ≈ 80%) so the idf spread actually
orders results — a query set of uniform-df terms would rank on tf
alone and leave the idf path untested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kinesis_stream_spark.operators.retrieval import bm25_topk, vocab_coverage
from kinesis_stream_spark.operators.retrieval_sql import (
    sql_bm25_topk,
    sql_vocab_coverage,
)
from kinesis_stream_spark.sources.batch import load_table

QUERIES = {}
ORACLE = {}

#: literal query set, shared verbatim by both engines
BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "dup scan filter"),
    (2, "hash join merge sort"),
    (3, "stream window batch dup fast"),
)

K = 10


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


@_q("text_bm25_topk", sql_bm25_topk(BM25_QUERIES, k=K))
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index BM25 (rational idf) top-10 per query — the sparse
    counterpart to the dense ANN family. Postings are prefiltered to
    the query vocabulary before any shuffle; df/query/totals broadcast
    (operators/retrieval.py docstring for the full scale shape)."""
    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        list(BM25_QUERIES), "query_id long, qtext string"
    )
    return bm25_topk(docs, queries, k=K).orderBy("query_id", "rank")


@_q("text_vocab_coverage", sql_vocab_coverage())
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary sizing: smallest top-k vocabulary covering
    50/90/99% of token occurrences. The running sum over the ranked
    vocabulary is the DISTRIBUTED prefix sum (no single-reducer global
    window at any corpus size)."""
    docs = load_table(spark, sf_dir, "documents")
    return vocab_coverage(docs).orderBy("pct")
