"""Exact-decimal vector math over ``array<float>`` embedding columns.

Float dot products are order-sensitive and engines accumulate differently;
every product is therefore decimal-quantized (DECIMAL(27,12) — float32
products in double are exact to well past 12 significant decimals of these
unit-scale embeddings) and summed exactly, making cosine similarity
bit-reproducible across Spark, DuckDB, partitionings, and AQE decisions.

All JVM-side (`zip_with` + `aggregate` higher-order functions): at 100 TB a
brute-force top-k is a map-side score + TakeOrdered per query vector; no
Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(27,12)"


def _dec_sum(products: Column) -> Column:
    return F.aggregate(
        products,
        F.lit(0).cast(_DEC),
        lambda acc, x: (acc + x.cast(_DEC)).cast(_DEC),
    )


def dot_decimal(a: Column, b: Column) -> Column:
    """Exact-decimal dot product of two float arrays (as double)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return _dec_sum(prods).cast("double")


def norm_decimal(a: Column) -> Column:
    """Exact-decimal L2 norm (as double)."""
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(_dec_sum(sq).cast("double"))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity with exact-decimal accumulation; the final
    divide/sqrt are single IEEE ops (deterministic everywhere)."""
    return dot_decimal(a, b) / (norm_decimal(a) * norm_decimal(b))


# --- DuckDB twins ------------------------------------------------------------


def _sql_dec_sum(products_expr: str) -> str:
    return (
        f"LIST_SUM(LIST_TRANSFORM({products_expr}, "
        f"p -> CAST(p AS DECIMAL(27,12))))"
    )


def sql_dot(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot_decimal`."""
    prods = (
        f"LIST_TRANSFORM(LIST_ZIP({a}, {b}), "
        f"z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))"
    )
    return f"CAST({_sql_dec_sum(prods)} AS DOUBLE)"


def sql_norm(a: str) -> str:
    """DuckDB twin of :func:`norm_decimal`."""
    sq = f"LIST_TRANSFORM({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    return f"SQRT(CAST({_sql_dec_sum(sq)} AS DOUBLE))"


def sql_cosine(a: str, b: str) -> str:
    """DuckDB twin of :func:`cosine_similarity`."""
    return f"({sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}))"
