"""Cardinality-sketch query inventory (SURVEY.md §2.3 extension row
"HLL distinct sketch"): the HyperLogLog register build + estimate over
lineitem key columns, with the exact COUNT(DISTINCT) riding in the
same row so the parity check grades the sketch's error itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kinesis_stream_spark.operators.hll import hll_distinct, sql_hll_distinct
from kinesis_stream_spark.sources.batch import load_table

QUERIES = {}
ORACLE = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


_HLL_COLS = ["l_orderkey", "l_partkey", "l_suppkey"]


@_q(
    "agg_hll_distinct",
    sql_hll_distinct("lineitem", _HLL_COLS) + " ORDER BY column_name",
)
def agg_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog cardinality estimates for the lineitem key columns
    next to their exact distinct counts — md5-derived register hashing,
    exact-integer harmonic sum, one pinned float literal + one IEEE
    divide for the estimate (operator docstring for the combinable
    register shape and the linear-counting deployment note)."""
    li = load_table(spark, sf_dir, "lineitem")
    return hll_distinct(li, _HLL_COLS).orderBy("column_name")
