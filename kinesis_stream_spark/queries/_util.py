"""Cross-engine determinism helpers.

The driver hashes query results value-by-value against a DuckDB oracle,
so floating-point aggregation must be *bitwise* reproducible across
engines and across partition orderings. Strategy:

- Per-row double arithmetic is already deterministic (IEEE-754, same
  expression tree in both engines) — no rounding needed.
- SUM/AVG over doubles is NOT (summation order differs per partitioning),
  so every double aggregate goes through exact DECIMAL arithmetic:
  cast each addend to DECIMAL(27,6), sum exactly (integer arithmetic,
  order-independent), cast the final sum back to double (deterministic
  nearest-double). AVG = exact-sum / count.

This also matters at 100 TB: it makes results independent of the number
of partitions, AQE coalescing decisions, and speculative re-execution —
the per-row cast is partition-independent, so that production property
holds unconditionally.

Known cross-ENGINE nuance (oracle-side only): the double→DECIMAL cast
itself can round differently between engines when the value lands on a
tie of the scaled product — Spark rounds the double's exact decimal
expansion, DuckDB rounds the IEEE ``value * 10^scale`` product. For
price-like data (2-decimal intent) ties are vanishingly rare (all dsum
queries hash-match DuckDB at sf0.001/0.01/0.1); for DENSE doubles
(scores, ratios) use floor-based fixed point instead —
``floor(x * 10^scale)`` has no tie semantics — as text_curation_pipeline
does (divergence caught by the sf0.1 parity sweep).
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
