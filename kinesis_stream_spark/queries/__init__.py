"""Declared query inventory (the driver contract surface).

Each submodule exposes ``QUERIES: dict[str, Callable[(spark, sf_dir), DataFrame]]``
and ``ORACLE: dict[str, str]`` (DuckDB ANSI SQL). ``all_queries()`` /
``all_oracle_sql()`` merge them for ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for module in _modules():
        merged.update(module.QUERIES)
    return merged


def all_oracle_sql() -> dict[str, str]:
    merged: dict[str, str] = {}
    for module in _modules():
        merged.update(module.ORACLE)
    return merged


def _modules():
    from kinesis_stream_spark.queries import (
        dedup,
        multimodal,
        relational,
        scalar,
        similarity,
        streaming_batch,
        text,
        udf,
    )

    return (relational, scalar, streaming_batch, dedup, similarity, text, multimodal, udf)
