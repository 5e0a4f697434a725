"""Event-time operators: tumbling / sliding / session windows, watermark
late-data handling, stateful dedup.

These generalize the reference's only event-time behavior — the late-ack
guard (`ShardCheckpointTrackerActor.scala:35`: an ack below the checkpointed
prefix is dropped) — into Spark's watermark model: state below the watermark
is finalized, later-arriving data for it is dropped.

Every function takes and returns a plain DataFrame and works on BOTH batch
and streaming inputs (Structured Streaming's core contract), so the batch
path is DuckDB-oracle-checkable while the stream path runs the identical
code. Window starts/ends are emitted as explicit columns, aggregates in
exact DECIMAL (see queries/_util.py) so results are partition-order free.

Scale notes (100 TB): all of these shuffle once on (key, window); session
windows additionally require a per-key sort inside the state store. Skewed
keys (one user with millions of events) are the hazard — AQE skew handling
covers the batch path; for streams, salt the key and merge sessions in a
second pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_stream_spark.queries._util import dsum


def _finish(df: DataFrame, win: Column, keys: list[str], order_cols: list[str]) -> DataFrame:
    out = (
        df.groupBy(win.alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )
    # Sorting a streaming aggregate is only legal in complete output
    # mode; in the append/update + watermark shape this module documents
    # it raises AnalysisException. Order is a batch/oracle-presentation
    # concern only — streams stay unsorted.
    if not out.isStreaming:
        out = out.orderBy("window_start", *order_cols)
    return out


def tumbling_window_agg(
    events: DataFrame, *, ts_col: str = "ts", duration: str = "1 hour"
) -> DataFrame:
    """Non-overlapping fixed windows: count + exact sum per (window, type)."""
    return _finish(
        events,
        F.window(F.col(ts_col), duration),
        ["event_type"],
        ["event_type"],
    )


def sliding_window_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Overlapping windows — each row lands in duration/slide windows."""
    return _finish(
        events,
        F.window(F.col(ts_col), duration, slide),
        ["event_type"],
        ["event_type"],
    )


def session_window_agg(
    events: DataFrame, *, ts_col: str = "ts", gap: str = "10 minutes"
) -> DataFrame:
    """Per-user sessions: a session extends while successive events arrive
    within ``gap``; ``session_end = last_event + gap`` (Spark semantics).

    Uses ``F.session_window``, which works on batch AND streaming input; the
    DuckDB oracle emulates it with gap-and-island SQL (lag → new-session
    flag → running sum as session id), see queries/streaming_batch.py.
    """
    out = (
        events.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
    if not out.isStreaming:  # sort is illegal in append/update streaming mode
        out = out.orderBy("user_id", "session_start")
    return out


def with_late_data_drop(
    events: DataFrame, *, ts_col: str = "ts", delay: str = "1 hour"
) -> DataFrame:
    """Watermark: tolerate ``delay`` of out-of-orderness, then finalize.

    Streaming: bounds state and drops late rows (the engine-level
    generalization of the reference's late-ack guard). Batch: watermark is
    a no-op by Spark contract (all data is present), so the same pipeline
    is exact — which is what makes the batch oracle valid.
    """
    return events.withWatermark(ts_col, delay)


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    *,
    ts_col: str = "ts",
    delay: str = "1 hour",
    streaming: bool = True,
) -> DataFrame:
    """Stateful dedup: first record per key wins; state expires with the
    watermark so it stays bounded on infinite streams.

    At-least-once delivery (SURVEY §2.1 delivery semantics) makes duplicate
    *deliveries* possible after crash-before-checkpoint; this operator is
    the downstream exactly-once repair for idempotent keys.
    """
    if streaming:
        return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def session_funnel_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    gap: str = "10 minutes",
    from_type: str = "click",
    to_type: str = "purchase",
) -> DataFrame:
    """Per-session conversion funnel: within each user session (gap
    semantics of :func:`session_window_agg`), count ``from_type`` and
    ``to_type`` events and flag the session converted when a ``to``
    event occurs at-or-after the first ``from`` event — the
    click→purchase attribution measure computed where it belongs, on
    session state, not with a self-join. Conditional aggregates ride the
    same single (user, session) shuffle the session window needs anyway;
    runs on batch and streaming input (session_window + aggregates are
    stream-legal)."""
    is_from = F.col("event_type") == from_type
    is_to = F.col("event_type") == to_type
    out = (
        events.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), "user_id")
        .agg(
            F.sum(F.when(is_from, 1).otherwise(0)).cast("long").alias("n_from"),
            F.sum(F.when(is_to, 1).otherwise(0)).cast("long").alias("n_to"),
            F.min(F.when(is_from, F.col(ts_col))).alias("_first_from"),
            F.max(F.when(is_to, F.col(ts_col))).alias("_last_to"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            "user_id",
            "n_from",
            "n_to",
            F.when(F.col("_last_to") >= F.col("_first_from"), 1)
            .otherwise(0)
            .cast("int")
            .alias("converted"),
        )
    )
    if not out.isStreaming:
        out = out.orderBy("user_id", "session_start")
    return out


def rate_anomaly(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    duration: str = "1 hour",
    lookback: int = 3,
    factor: int = 2,
) -> DataFrame:
    """Event-rate spike detection: per (window, event_type) counts, each
    compared against the trailing ``lookback`` windows — flagged when
    ``n_events · n_prev > factor · sum_prev`` (i.e. the count exceeds
    ``factor`` × the trailing mean, expressed entirely in integers so
    both engines agree without a float mean or stddev). This is the
    monitoring pass over a streaming pipeline's windowed-count sink: the
    stream materializes per-window counts (tumbling_window_agg); this
    analytic runs batch-side on that table (an ordered window over an
    aggregate is not stream-legal, and doesn't need to be — late windows
    are finalized by then). Scale: per-type time series after a ~10²-row
    windowed agg — the window shuffle is on event_type, trivially small
    next to producing the counts."""
    counts = (
        events.groupBy(F.window(F.col(ts_col), duration).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("window_start")
        .rowsBetween(-lookback, -1)
    )
    return (
        counts.withColumn("sum_prev", F.coalesce(F.sum("n_events").over(w), F.lit(0)))
        .withColumn("n_prev", F.count(F.lit(1)).over(w))
        .withColumn(
            "spike",
            F.when(
                (F.col("n_prev") > 0)
                & (F.col("n_events") * F.col("n_prev") > factor * F.col("sum_prev")),
                1,
            )
            .otherwise(0)
            .cast("int"),
        )
        .orderBy("event_type", "window_start")
    )


def static_enrich_agg(
    events: DataFrame,
    dim: DataFrame,
    *,
    key: str = "user_id",
    dim_key: str = "c_custkey",
    dim_attr: str = "c_mktsegment",
    unknown: str = "UNKNOWN",
) -> DataFrame:
    """Stream-static enrichment: left-join the event stream to a
    broadcast dimension table, then aggregate per (dim attribute,
    event_type) — the canonical "enrich the stream with reference data"
    shape (user → segment, device → model, ...).

    The dim side is static, so Spark re-plans it per micro-batch and the
    broadcast join never shuffles the stream; unmatched events keep
    flowing with ``unknown`` (a stream must not silently drop rows
    because reference data is incomplete — at 100 TB/day the unmatched
    count IS the data-quality metric). Works on batch and streaming
    input (module contract): the batch run is the DuckDB-oracle-checked
    twin, the stream run is asserted equal in tests/test_streaming.py.
    """
    d = dim.select(F.col(dim_key).alias(key), F.col(dim_attr).alias("_attr"))
    enriched = events.join(F.broadcast(d), key, "left")
    out = (
        enriched.groupBy(
            F.coalesce(F.col("_attr"), F.lit(unknown)).alias("segment"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
    )
    if not out.isStreaming:
        out = out.orderBy("segment", "event_type")
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str = "l_user",
    right_key: str = "r_user",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    upper: str = "10 minutes",
) -> DataFrame:
    """Event-time interval join: pair each left row with right rows for
    the same key whose timestamp falls in ``[left_ts, left_ts + upper]``.
    Inputs must use disjoint column names; the joined frame keeps all of
    them.

    Works on batch AND streaming inputs (the module contract). On
    streams this is Spark's stream-stream join: both sides shuffle on
    the equi-key, and the time bound plus each side's watermark is what
    lets the state store EVICT — an unbounded-condition stream join
    would accumulate state forever, so the bound is correctness, not
    optimization (callers must ``withWatermark`` both inputs). Batch
    runs the identical plan minus state, which is what makes the DuckDB
    range-join oracle valid.
    """
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(right, cond)
