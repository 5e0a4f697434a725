"""Experiment analysis: deterministic hash-bucket assignment and the
two-proportion z-test per metric (SURVEY.md §2.3 extension row; no
counterpart in the reference — kinesis-stream hands decoded records to
user code, and experimentation analytics happens downstream; this is
that downstream, re-expressed declaratively).

The A/B readout every event pipeline ends in: assign each unit
(user) to control/treatment by a DETERMINISTIC hash of its id (the
md5 discipline of functions/hashing.py — re-runs, retries, and the
oracle all agree on the split), define per-unit binary conversion
metrics, and score the lift with the pooled two-proportion z statistic

    z = (p_t − p_c) / sqrt(p̂(1−p̂)(1/n_c + 1/n_t))

Cross-engine exactness: unit assignment and conversion counts are
exact integers; p's and the z are pinned-order double arithmetic
(IEEE divides, one multiply chain, one sqrt — sqrt is correctly
rounded in both engines, the `queries/_util.py` rule). Degenerate
pools (0% or 100% pooled conversion ⇒ se = 0) yield NULL z by
contract on both sides.

Scale shape: one corpus pass builds the distinct (metric, unit) frame
(map-side combinable distinct); the unit universe with its hash
bucket is unit-sized, not event-sized; per-metric counts reduce to a
|metrics|-row frame joined broadcast against the 2-row variant
totals. Nothing driver-side, no window, no skew surface (the hash
split is uniform by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_stream_spark.functions.hashing import md5_int64, sql_md5_int64


def ab_conversion_ztest(
    events: DataFrame,
    *,
    unit_col: str = "user_id",
    metric_col: str = "event_type",
) -> DataFrame:
    """Per-metric two-proportion z-test under a deterministic 50/50
    hash split of the units.

    A unit "converts" on metric m if it has ≥ 1 event with
    ``metric_col = m``. Output per metric: (metric, n_control,
    n_treatment, conv_control, conv_treatment, p_control, p_treatment,
    lift, z_score) — z NULL when the pooled rate is 0 or 1 (se = 0).
    NULL units are excluded (no identity to randomize on)."""
    units = (
        events.where(F.col(unit_col).isNotNull())
        .select(F.col(unit_col).alias("unit"))
        .distinct()
        .select(
            "unit",
            (md5_int64(F.col("unit").cast("string")) % 2).alias("variant"),
        )
    )
    totals = (
        units.groupBy()
        .agg(
            F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_c"),
            F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_t"),
        )
    )
    conv = (
        events.where(F.col(unit_col).isNotNull() & F.col(metric_col).isNotNull())
        .select(F.col(metric_col).alias("metric"), F.col(unit_col).alias("unit"))
        .distinct()
        .join(units, "unit")
        .groupBy("metric")
        .agg(
            F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
            .cast("long")
            .alias("c_c"),
            F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
            .cast("long")
            .alias("c_t"),
        )
    )
    nc_d = F.col("n_c").cast("double")
    nt_d = F.col("n_t").cast("double")
    # an empty arm (every unit hashed one way — tiny cohorts) has no
    # rate: NULL p/lift/z by contract, and the guard also keeps ANSI
    # division happy on both engines
    empty_arm = (F.col("n_c") == 0) | (F.col("n_t") == 0)
    p_c = F.when(empty_arm, F.lit(None).cast("double")).otherwise(
        F.col("c_c").cast("double") / nc_d
    )
    p_t = F.when(empty_arm, F.lit(None).cast("double")).otherwise(
        F.col("c_t").cast("double") / nt_d
    )
    pooled = (F.col("c_c") + F.col("c_t")).cast("double") / (
        F.col("n_c") + F.col("n_t")
    ).cast("double")
    se = F.sqrt(pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / nc_d + F.lit(1.0) / nt_d))
    degenerate = (
        empty_arm
        | (F.col("c_c") + F.col("c_t") == 0)
        | (F.col("c_c") + F.col("c_t") == F.col("n_c") + F.col("n_t"))
    )
    z = F.when(degenerate, F.lit(None).cast("double")).otherwise((p_t - p_c) / se)
    return conv.crossJoin(F.broadcast(totals)).select(
        "metric",
        F.col("n_c").alias("n_control"),
        F.col("n_t").alias("n_treatment"),
        F.col("c_c").alias("conv_control"),
        F.col("c_t").alias("conv_treatment"),
        p_c.alias("p_control"),
        p_t.alias("p_treatment"),
        (p_t - p_c).alias("lift"),
        z.alias("z_score"),
    )


def sql_ab_conversion_ztest(
    *,
    table: str = "events",
    unit_col: str = "user_id",
    metric_col: str = "event_type",
) -> str:
    """DuckDB oracle twin of :func:`ab_conversion_ztest` — identical
    hash split, counts, and pinned-order z arithmetic."""
    h = sql_md5_int64(f"CAST(unit AS VARCHAR)")
    return f"""
    WITH units AS (
      SELECT unit, {h} % 2 AS variant
      FROM (SELECT DISTINCT {unit_col} AS unit FROM {table}
            WHERE {unit_col} IS NOT NULL)),
    totals AS (
      SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t
      FROM units),
    conv AS (
      SELECT metric,
             CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_c,
             CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_t
      FROM (SELECT DISTINCT {metric_col} AS metric, {unit_col} AS unit
            FROM {table}
            WHERE {unit_col} IS NOT NULL AND {metric_col} IS NOT NULL)
      JOIN units USING (unit)
      GROUP BY metric)
    SELECT metric,
           n_c AS n_control, n_t AS n_treatment,
           c_c AS conv_control, c_t AS conv_treatment,
           CASE WHEN n_c = 0 OR n_t = 0 THEN NULL
                ELSE CAST(c_c AS DOUBLE) / CAST(n_c AS DOUBLE) END AS p_control,
           CASE WHEN n_c = 0 OR n_t = 0 THEN NULL
                ELSE CAST(c_t AS DOUBLE) / CAST(n_t AS DOUBLE) END AS p_treatment,
           CASE WHEN n_c = 0 OR n_t = 0 THEN NULL
                ELSE CAST(c_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                     - CAST(c_c AS DOUBLE) / CAST(n_c AS DOUBLE) END AS lift,
           CASE WHEN n_c = 0 OR n_t = 0
                  OR c_c + c_t = 0 OR c_c + c_t = n_c + n_t THEN NULL
                ELSE (CAST(c_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                      - CAST(c_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                     / SQRT((CAST(c_c + c_t AS DOUBLE)
                             / CAST(n_c + n_t AS DOUBLE))
                            * (1.0 - CAST(c_c + c_t AS DOUBLE)
                                     / CAST(n_c + n_t AS DOUBLE))
                            * (1.0 / CAST(n_c AS DOUBLE)
                               + 1.0 / CAST(n_t AS DOUBLE)))
           END AS z_score
    FROM conv CROSS JOIN totals
    """


def apdex_score(
    events: DataFrame,
    *,
    threshold: float,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-key Apdex score (Apdex Alliance spec): with a target
    threshold T, an observation is *satisfied* at value ≤ T,
    *tolerating* at value ≤ 4T, *frustrated* beyond —

        Apdex_T = (satisfied + tolerating/2) / total

    — the SLA readout ops dashboards publish next to raw percentiles
    (the percentile-band family in this repo reports the distribution;
    Apdex collapses it to one comparable score per key).

    Cross-engine exactness: the three bucket counts are exact integers
    (threshold compares on the raw double values — per-row compares
    are deterministic) and the score is ⌊10^6·(2·sat + tol)/(2·n)⌋ in
    DECIMAL(38,0) arithmetic — integer end to end, no float aggregate.
    NULL values are excluded by contract (no latency, no opinion);
    keys with no non-NULL values are absent.

    Scale shape: one map-side-combinable per-key conditional-count
    aggregate over the corpus — no window, no join."""
    if not threshold > 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    d38 = "decimal(38,0)"
    t = F.lit(float(threshold))
    per = (
        events.where(F.col(value_col).isNotNull())
        .select(F.col(key_col).alias("key"), F.col(value_col).alias("v"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("v") <= t, 1).otherwise(0))
            .cast("long")
            .alias("n_satisfied"),
            F.sum(
                F.when(
                    (F.col("v") > t) & (F.col("v") <= t * 4), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_tolerating"),
        )
    )
    return per.select(
        "key",
        "n",
        "n_satisfied",
        "n_tolerating",
        (F.col("n") - F.col("n_satisfied") - F.col("n_tolerating")).alias(
            "n_frustrated"
        ),
        F.expr(
            f"cast((cast(n_satisfied as {d38}) * 2 + n_tolerating)"
            f" * 1000000 div (cast(n as {d38}) * 2) as long)"
        ).alias("apdex_ppm"),
    )


def sql_apdex_score(
    *,
    threshold: float,
    table: str = "events",
    key_col: str = "event_type",
    value_col: str = "value",
) -> str:
    """DuckDB oracle twin of :func:`apdex_score`."""
    t = float(threshold)
    return f"""
    WITH per AS (
      SELECT {key_col} AS key, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN {value_col} <= {t!r} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_satisfied,
             CAST(SUM(CASE WHEN {value_col} > {t!r}
                            AND {value_col} <= {t!r} * 4
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_tolerating
      FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1)
    SELECT key, n, n_satisfied, n_tolerating,
           n - n_satisfied - n_tolerating AS n_frustrated,
           CAST((CAST(n_satisfied AS HUGEINT) * 2 + n_tolerating) * 1000000
                // (CAST(n AS HUGEINT) * 2) AS BIGINT) AS apdex_ppm
    FROM per
    """
