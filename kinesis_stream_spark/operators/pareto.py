"""2-D Pareto skyline (dominance frontier) — classic OLAP operator.

A row survives the skyline iff no other row (in its group) dominates
it: dominance = ≤ on the minimized dimension AND ≥ on the maximized
dimension, strict in at least one. Reference scope note: the reference
(`500px/kinesis-stream`) ships no query operators at all (payloads are
opaque user-decoded bytes, `Record.scala:15`); this is north-star
extension surface alongside the relational inventory.

Scale shape — NOT the textbook O(n²) dominance join:

1. per-(group, min-value) MAX of the maximized dimension — a corpus-
   sized but map-side-combinable aggregate (the only pass over the
   full data);
2. a strict prefix-max window over that aggregated frame, ordered by
   the minimized dimension, partitioned by group — the frame holds one
   row per DISTINCT (group, min-value), bounded by the value domain,
   not the corpus; a frontier value survives iff it strictly exceeds
   the best of all strictly-cheaper values;
3. a broadcast join back to the raw rows keeps every row that ties the
   surviving frontier point (incomparable duplicates all survive,
   per the dominance definition's strictness clause).

The DuckDB oracle deliberately uses the INDEPENDENT quadratic
NOT-EXISTS formulation — two different algorithms agreeing on the
same frontier is a stronger check than replaying one of them.

Only comparisons and MAX touch the data — no arithmetic — so floats
(prices) are compared exactly and parity is trivial. Rows with NULL in
either dimension are excluded up front (NULL is incomparable under
dominance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(
    df: DataFrame,
    *,
    min_col: str,
    max_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier minimizing ``min_col`` and
    maximizing ``max_col``, per ``group_col`` (or globally when None).
    Returns the surviving input rows with their original columns."""
    gb = [group_col] if group_col else []
    clean = df.where(F.col(min_col).isNotNull() & F.col(max_col).isNotNull())
    per_value = clean.groupBy(*gb, min_col).agg(F.max(max_col).alias("_best"))
    w = (
        Window.partitionBy(*gb)
        .orderBy(F.asc(min_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # survive iff strictly better than everything strictly cheaper; a
    # tie with a cheaper point is dominated (strict on the min dim)
    frontier = (
        per_value.withColumn("_prefix", F.max("_best").over(w))
        .where(F.col("_prefix").isNull() | (F.col("_prefix") < F.col("_best")))
        .select(*gb, min_col, "_best")
    )
    # join back with NULL-SAFE equality on the group key: groupBy and
    # the window both bucket NULL group keys together, but a plain
    # equi-join would silently drop every NULL-group row here (min_col
    # is non-null by the `clean` filter, so only the group needs <=>)
    fr = frontier.select(
        *([F.col(group_col).alias("_f_grp")] if group_col else []),
        F.col(min_col).alias("_f_min"),
        "_best",
    )
    cond = F.col(min_col) == F.col("_f_min")
    if group_col:
        cond = F.col(group_col).eqNullSafe(F.col("_f_grp")) & cond
    return (
        clean.join(F.broadcast(fr), cond)
        .where(F.col(max_col) == F.col("_best"))
        .drop("_f_min", "_best", *(["_f_grp"] if group_col else []))
    )


def sql_skyline_2d(
    *,
    table: str,
    min_col: str,
    max_col: str,
    group_col: str | None = None,
    select_cols: tuple[str, ...] = ("*",),
) -> str:
    """Oracle for :func:`skyline_2d` via the independent quadratic
    NOT-EXISTS dominance definition. The group compare is NULL-safe
    (IS NOT DISTINCT FROM) to match Spark's groupBy, which buckets
    NULL group keys together — plain ``=`` would exempt NULL-group
    rows from dominance entirely."""
    same_group = (
        f"AND q.{group_col} IS NOT DISTINCT FROM p.{group_col}"
        if group_col
        else ""
    )
    cols = ", ".join(f"p.{c}" if c != "*" else "p.*" for c in select_cols)
    return f"""
    SELECT {cols}
    FROM {table} p
    WHERE p.{min_col} IS NOT NULL AND p.{max_col} IS NOT NULL
      AND NOT EXISTS (
        SELECT 1 FROM {table} q
        WHERE q.{min_col} IS NOT NULL AND q.{max_col} IS NOT NULL
          {same_group}
          AND q.{min_col} <= p.{min_col} AND q.{max_col} >= p.{max_col}
          AND (q.{min_col} < p.{min_col} OR q.{max_col} > p.{max_col})
      )
    """
