"""Data-layout operators: Z-order (Morton) clustering keys and the
locality census that proves they work.

SURVEY.md §2.3 extension row; no counterpart in the reference —
kinesis-stream never touches storage layout (opaque payloads,
`Record.scala:15`). This is the lakehouse side of the engine: writing
a 100 TB table ordered by a Morton interleave of its two hottest
filter columns is what makes BOTH `WHERE x BETWEEN …` and
`WHERE y BETWEEN …` prune files (Delta/Iceberg OPTIMIZE ZORDER;
Morton 1966) — a single-column sort prunes only its own column.

Cross-engine exactness: the interleave is pure bit arithmetic —
per-bit shift/mask/scale, summed as BIGINT. Spark's ``shiftright``/
``&`` and DuckDB's ``>>``/``&`` agree on non-negative BIGINTs (the
repo's bin/shift parity note), so the key is bit-identical on both
engines. No floats anywhere.

Scale shape: the key computation is map-only (one projection, no
shuffle — whole-stage codegen over ~2·BITS integer ops per row); the
census is one combinable aggregate over the keyed frame. Writing the
layout is then ``df.repartitionByRange(z).sortWithinPartitions(z)``
— one range exchange, exactly the shuffle the layout amortizes
forever after.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits interleaved per dimension (2·BITS ≤ 62 keeps the key BIGINT)
ZBITS = 16


def _interleave_expr(x: str, y: str, bits: int = ZBITS) -> str:
    """SQL expression interleaving the low ``bits`` of non-negative
    integer columns ``x`` (even positions) and ``y`` (odd positions)
    — valid in both Spark SQL and DuckDB (shift/mask/add only)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({y} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


def zorder_key(x: str, y: str, *, bits: int = ZBITS) -> Column:
    """Morton key of two non-negative integer columns (Spark side;
    column NAMES — the expression compiles into whole-stage codegen)."""
    return F.expr(_interleave_expr(x, y, bits))


def zorder_census(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    bucket_bits: int = 20,
    bits: int = ZBITS,
) -> DataFrame:
    """Bucket rows by their Morton key's high bits (``z div
    2^bucket_bits`` — what a file boundary would be after an OPTIMIZE
    ZORDER write) and report each bucket's row count and x/y extents.

    The census IS the layout's value proposition made measurable: with
    a Morton order every bucket covers a RECTANGLE in (x, y) space, so
    its min/max column stats prune under predicates on either column —
    the output is exactly the file-skipping index a reader would
    consult. Compare against a single-column sort: y extents per
    bucket span the whole domain and y-predicates prune nothing.

    Output: (zbucket, n_rows, x_min, x_max, y_min, y_max), all BIGINT.
    Inputs must be non-negative and < 2^bits (caller maps/clamps —
    same contract as any space-filling-curve index)."""
    zbucket = F.expr(
        f"cast({_interleave_expr(x_col, y_col, bits)} as bigint)"
        f" div {1 << bucket_bits}"
    )
    return (
        df.select(
            F.col(x_col).cast("long").alias("x"),
            F.col(y_col).cast("long").alias("y"),
            zbucket.alias("zbucket"),
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )


def sql_zorder_census(
    *,
    source_cte: str,
    bucket_bits: int = 20,
    bits: int = ZBITS,
) -> str:
    """DuckDB oracle twin of :func:`zorder_census`. ``source_cte``
    must yield non-negative integer columns (x, y)."""
    z = _interleave_expr("x", "y", bits)
    return f"""
    WITH src AS ({source_cte}),
    keyed AS (
      SELECT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
             CAST({z} AS BIGINT) // {1 << bucket_bits} AS zbucket
      FROM src)
    SELECT zbucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(x) AS x_min, MAX(x) AS x_max,
           MIN(y) AS y_min, MAX(y) AS y_max
    FROM keyed GROUP BY 1
    """
