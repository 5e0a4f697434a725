"""Marketing-touch attribution over the event stream: credit each
conversion to the touches that preceded it inside a lookback window,
under first-touch and last-touch models simultaneously.

SURVEY.md §2.3 extension row; no counterpart in the reference —
kinesis-stream hands decoded records to user code (`Record.scala:15`)
and attribution happens downstream; this is that downstream,
re-expressed declaratively.

Cross-engine exactness: the candidate join is pure integer-microsecond
interval arithmetic; first/last selection is a ROW_NUMBER over the
total order (touch_us, touch_id) — event ids are unique, so the order
is tie-free on both engines; credited values accumulate through the
repo's DECIMAL(27,6) dsum discipline.

Scale shape: one equi-join on the entity key (user) with the lookback
bound as a join-side filter — candidates per conversion are bounded by
the user's touch activity inside the window, never the corpus; the
first/last windows partition by conversion id (already-joined frame);
the final aggregate collapses to |touch types| rows. Hot users fatten
their own partitions only — at crawl-scale skew the standard fix is
salting the user key through the repo's salted two-phase aggregate
(operators/skew.py), unchanged semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kinesis_stream_spark.queries._util import dsum

#: default lookback window: 7 days of microseconds
LOOKBACK_US = 7 * 24 * 3600 * 1_000_000


def first_last_touch(
    events: DataFrame,
    *,
    conversion_type: str = "purchase",
    lookback_us: int = LOOKBACK_US,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-touch-type attribution report: for every conversion (an
    event of ``conversion_type``), find the entity's touches (any
    other event type) with ``conv_us − lookback_us ≤ touch_us ≤
    conv_us``, credit the earliest to the first-touch model and the
    latest to the last-touch model, and aggregate per touch type:

        (touch_type, first_touch_convs, last_touch_convs,
         first_touch_value, last_touch_value)

    where the value columns are the exact-decimal sums of the credited
    conversions' values. Conversions with no in-window touch earn no
    row (organic — measured separately by subtracting attributed
    counts from the conversion total). NULL entity/ts rows carry no
    position and are excluded by contract."""
    base = events.where(
        F.col(entity_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(entity_col).alias("ent"),
        F.col(type_col).alias("etype"),
        F.expr(f"unix_micros(cast({ts_col} as timestamp))").alias("us"),
        F.col(id_col).alias("eid"),
        F.col(value_col).alias("val"),
    )
    conv = base.where(F.col("etype") == conversion_type).select(
        "ent",
        F.col("eid").alias("conv_id"),
        F.col("us").alias("conv_us"),
        F.col("val").alias("conv_val"),
    )
    touch = base.where(F.col("etype") != conversion_type).select(
        "ent",
        F.col("etype").alias("touch_type"),
        F.col("us").alias("touch_us"),
        F.col("eid").alias("touch_id"),
    )
    cand = conv.join(touch, "ent").where(
        (F.col("touch_us") <= F.col("conv_us"))
        & (F.col("touch_us") >= F.col("conv_us") - F.lit(lookback_us))
    )
    w_first = Window.partitionBy("conv_id").orderBy(
        F.asc("touch_us"), F.asc("touch_id")
    )
    w_last = Window.partitionBy("conv_id").orderBy(
        F.desc("touch_us"), F.desc("touch_id")
    )
    ranked = cand.select(
        "conv_id",
        "conv_val",
        "touch_type",
        F.row_number().over(w_first).alias("rn_first"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    credited = ranked.where(
        (F.col("rn_first") == 1) | (F.col("rn_last") == 1)
    ).select(
        "touch_type",
        (F.col("rn_first") == 1).cast("long").alias("is_first"),
        (F.col("rn_last") == 1).cast("long").alias("is_last"),
        F.when(F.col("rn_first") == 1, F.col("conv_val")).alias("fv"),
        F.when(F.col("rn_last") == 1, F.col("conv_val")).alias("lv"),
    )
    return credited.groupBy("touch_type").agg(
        F.sum("is_first").alias("first_touch_convs"),
        F.sum("is_last").alias("last_touch_convs"),
        dsum("fv", "first_touch_value"),
        dsum("lv", "last_touch_value"),
    )


def sql_first_last_touch(
    *,
    table: str = "events",
    conversion_type: str = "purchase",
    lookback_us: int = LOOKBACK_US,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> str:
    """DuckDB oracle twin of :func:`first_last_touch` (identical
    interval join, tie-free ROW_NUMBER selection, DECIMAL sums)."""
    return f"""
    WITH base AS (
      SELECT {entity_col} AS ent, {type_col} AS etype,
             EPOCH_US({ts_col}) AS us, {id_col} AS eid, {value_col} AS val
      FROM {table}
      WHERE {entity_col} IS NOT NULL AND {ts_col} IS NOT NULL),
    conv AS (
      SELECT ent, eid AS conv_id, us AS conv_us, val AS conv_val
      FROM base WHERE etype = '{conversion_type}'),
    touch AS (
      SELECT ent, etype AS touch_type, us AS touch_us, eid AS touch_id
      FROM base WHERE etype <> '{conversion_type}'),
    cand AS (
      SELECT c.conv_id, c.conv_val, t.touch_type, t.touch_us, t.touch_id
      FROM conv c JOIN touch t USING (ent)
      WHERE t.touch_us <= c.conv_us
        AND t.touch_us >= c.conv_us - {lookback_us}),
    ranked AS (
      SELECT conv_id, conv_val, touch_type,
             ROW_NUMBER() OVER (PARTITION BY conv_id
               ORDER BY touch_us ASC, touch_id ASC) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY conv_id
               ORDER BY touch_us DESC, touch_id DESC) AS rn_last
      FROM cand)
    SELECT touch_type,
           CAST(SUM(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS first_touch_convs,
           CAST(SUM(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS last_touch_convs,
           CAST(SUM(CASE WHEN rn_first = 1
                THEN CAST(conv_val AS DECIMAL(27,6)) END) AS DOUBLE)
             AS first_touch_value,
           CAST(SUM(CASE WHEN rn_last = 1
                THEN CAST(conv_val AS DECIMAL(27,6)) END) AS DOUBLE)
             AS last_touch_value
    FROM ranked
    WHERE rn_first = 1 OR rn_last = 1
    GROUP BY 1
    """
