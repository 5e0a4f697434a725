"""Graph query inventory: PageRank over the purchase graph.

The edge extraction is the heavy part at scale — a fact-to-fact join
(lineitem ⋈ orders) distilled to distinct customer→supplier edges —
and the iteration is the new algorithmic surface: fixed-round integer
power iteration whose every step the DuckDB oracle replays (unrolled
CTEs). Suppliers are pure sinks in this graph (no out-edges), so the
dangling-mass path is exercised on every round, not just in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_spark.operators.graph import kcore, pagerank, sql_kcore, sql_pagerank
from kinesis_stream_spark.queries._emb_family import make_q
from kinesis_stream_spark.sources.batch import load_table

QUERIES = {}
ORACLE = {}
_q = make_q(QUERIES, ORACLE)

ITERATIONS = 3

_EDGES_CTE = """
  SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
         's' || CAST(l.l_suppkey AS VARCHAR) AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


@_q(
    "graph_pagerank_purchases",
    sql_pagerank(_EDGES_CTE, iterations=ITERATIONS)
    + " ORDER BY rank_fx DESC, node",
)
def graph_pagerank_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer→supplier purchase graph — who holds
    the demand-weighted influence. Node ids are type-prefixed strings
    ('c…'/'s…') because customer and supplier keys share a numeric
    range. The extraction join is the only corpus-sized work; each of
    the 3 power-iteration rounds is one edge-map + dst-keyed sum with
    the corpus-independent mass bound (operators/graph.py)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    return pagerank(edges, iterations=ITERATIONS).orderBy(
        F.desc("rank_fx"), F.asc("node")
    )


_KCORE_K, _KCORE_ROUNDS = 40, 3


@_q(
    "graph_kcore_purchases",
    sql_kcore(_EDGES_CTE, k=_KCORE_K, rounds=_KCORE_ROUNDS)
    + " ORDER BY node",
)
def graph_kcore_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core of the customer↔supplier purchase graph (k = 40, 3 peel
    rounds): the buyers and suppliers still mutually dense after
    low-degree nodes cascade out — the dense-subgraph extraction that
    complements PageRank's per-node scores. Fixed-round peeling with
    integer degrees only; the oracle unrolls the identical rounds
    (operators/graph.py)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    return kcore(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS).orderBy("node")
