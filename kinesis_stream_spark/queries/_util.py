"""Cross-engine determinism helpers.

The driver hashes query results value-by-value against a DuckDB oracle,
so floating-point aggregation must be *bitwise* reproducible across
engines and across partition orderings. Strategy:

- Per-row double arithmetic is already deterministic (IEEE-754, same
  expression tree in both engines) — no rounding needed.
- SUM/AVG over doubles is NOT (summation order differs per partitioning),
  so every double aggregate goes through exact DECIMAL arithmetic:
  cast each addend to DECIMAL(27,6) (exact decimal rounding of the
  double — identical in both engines), sum exactly (integer arithmetic,
  order-independent), cast the final sum back to double (deterministic
  nearest-double). AVG = exact-sum / count.

This also matters at 100 TB: it makes results independent of the number
of partitions, AQE coalescing decisions, and speculative re-execution.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(27,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent double SUM (exact decimal accumulation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent double AVG = exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(DEC)).cast("double") / F.count(c)
    ).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
