"""Sparse-retrieval query inventory (documents table; SURVEY.md §2.3
extension rows "BM25 sparse retrieval" and "vocabulary coverage").

The fixed query set mixes the corpus's one rare term ("dup", df ≈ 5%
of docs) with common terms (df ≈ 80%) so the idf spread actually
orders results — a query set of uniform-df terms would rank on tf
alone and leave the idf path untested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_spark.operators.retrieval import (
    RRF_K,
    RRF_SCALE,
    bm25_topk,
    rrf_fuse,
    vocab_coverage,
)
from kinesis_stream_spark.operators.retrieval_sql import (
    sql_bm25_topk,
    sql_vocab_coverage,
)
from kinesis_stream_spark.queries._emb_family import make_q
from kinesis_stream_spark.sources.batch import load_table

QUERIES = {}
ORACLE = {}
_q = make_q(QUERIES, ORACLE)

#: literal query set, shared verbatim by both engines
BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "dup scan filter"),
    (2, "hash join merge sort"),
    (3, "stream window batch dup fast"),
)

K = 10


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


#: the fusion query set: ids 0..4 line up with ALL FIVE of the dense
#: side's query vectors (vec_id < N_QUERIES = 5), so every fused group
#: is a real two-list fusion — three re-keyed BM25 queries plus two
#: more from the same corpus vocabulary
RRF_QUERIES: tuple[tuple[int, str], ...] = tuple(
    (i, t) for i, (_, t) in enumerate(BM25_QUERIES)
) + (
    (3, "vector group window table"),
    (4, "customer order line slow dup"),
)


def _rrf_sql() -> str:
    # compose the two REGISTERED retrieval oracles verbatim (the dense
    # one post-guard) and fuse their ranks with exact integer floor
    # division — the recall-oracle composition pattern
    # (queries/similarity.py _RECALL_SQL)
    from kinesis_stream_spark.queries.similarity import ORACLE as SIM_ORACLE

    sparse = sql_bm25_topk(RRF_QUERIES, k=K)
    dense = SIM_ORACLE["similarity_topk_bruteforce"]
    return f"""
    WITH sparse AS (SELECT query_id, doc_id AS item_id, rank
                    FROM ({sparse})),
    dense AS (SELECT query_id, neighbor_id AS item_id, rank
              FROM ({dense})),
    allr AS (SELECT * FROM sparse UNION ALL SELECT * FROM dense),
    fused AS (
      SELECT query_id, item_id,
             CAST(SUM({RRF_SCALE} // ({RRF_K} + rank)) AS BIGINT) AS sfx,
             CAST(COUNT(*) AS BIGINT) AS n_lists
      FROM allr GROUP BY 1, 2
    )
    SELECT query_id, item_id,
           CAST(sfx AS DOUBLE) / {RRF_SCALE} AS rrf_score,
           n_lists, fused_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sfx DESC, item_id) AS fused_rank
      FROM fused)
    WHERE fused_rank <= {K}
    ORDER BY query_id, fused_rank
    """


@_q("retrieval_hybrid_rrf", _rrf_sql())
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the sparse BM25
    ranking (documents) and the dense exact-cosine ranking (embeddings)
    — the standard score-free combiner for heterogeneous retrievers.
    Both input rankings are the registered, independently-verified
    chains; the fusion itself is exact integer arithmetic (operator
    docstring), so the whole hybrid stack replays in the oracle."""
    from kinesis_stream_spark.queries.similarity import QUERIES as SIM_QUERIES

    docs = load_table(spark, sf_dir, "documents")
    qs = spark.createDataFrame(list(RRF_QUERIES), "query_id long, qtext string")
    sparse = bm25_topk(docs, qs, k=K).select(
        "query_id", F.col("doc_id").alias("item_id"), "rank"
    )
    dense = SIM_QUERIES["similarity_topk_bruteforce"](spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("item_id"), "rank"
    )
    return rrf_fuse([sparse, dense], k=K).orderBy("query_id", "fused_rank")


@_q("text_vocab_coverage", sql_vocab_coverage())
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary sizing: smallest top-k vocabulary covering
    50/90/99% of token occurrences. The running sum over the ranked
    vocabulary is the DISTRIBUTED prefix sum (no single-reducer global
    window at any corpus size)."""
    docs = load_table(spark, sf_dir, "documents")
    return vocab_coverage(docs).orderBy("pct")
