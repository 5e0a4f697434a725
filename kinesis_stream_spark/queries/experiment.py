"""Experiment-analysis query inventory (events table; SURVEY.md §2.3
extension row "A/B two-proportion z-test"): deterministic hash-split
assignment + per-metric conversion lift scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kinesis_stream_spark.operators.experiment import (
    ab_conversion_ztest,
    sql_ab_conversion_ztest,
)
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


@_q(
    "events_ab_test_zscore",
    sql_ab_conversion_ztest() + " ORDER BY metric",
)
def events_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type conversion A/B readout under a deterministic
    md5 50/50 user split: unit counts, conversion counts, rates, lift,
    and the pooled two-proportion z statistic — exact integer counts,
    pinned-order double z arithmetic, one corpus pass (operator
    docstring)."""
    ev = load_table(spark, sf_dir, "events")
    return ab_conversion_ztest(ev).orderBy("metric")


_APDEX_T = 50.0


@_q("events_apdex_score", None)  # assigned below
def events_apdex_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Apdex at target T=50 (the events table's value
    plays the latency role): satisfied ≤ T, tolerating ≤ 4T, score =
    ⌊10^6·(2·sat+tol)/(2·n)⌋ — integer end to end, one combinable
    aggregate (operator docstring)."""
    from kinesis_stream_spark.operators.experiment import apdex_score

    return apdex_score(
        load_table(spark, sf_dir, "events"), threshold=_APDEX_T
    ).orderBy("key")


from kinesis_stream_spark.operators.experiment import (  # noqa: E402
    sql_apdex_score,
)

ORACLE["events_apdex_score"] = (
    sql_apdex_score(threshold=_APDEX_T) + " ORDER BY key"
)


from kinesis_stream_spark.operators.experiment import (  # noqa: E402
    ab_welch_ttest,
    sql_ab_welch_ttest,
)


@_q("events_ab_welch_ttest", sql_ab_welch_ttest())
def events_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch unequal-variance t-test on per-user value totals under
    the same deterministic md5 50/50 split as the z-test — the
    continuous-metric A/B readout: exact per-unit decimal totals,
    DECIMAL(38,0) arm moments, pinned t and Welch-Satterthwaite dof
    (operators/experiment.py)."""
    ev = load_table(spark, sf_dir, "events")
    return ab_welch_ttest(ev)


from kinesis_stream_spark.operators.experiment import (  # noqa: E402
    anova_oneway,
    sql_anova_oneway,
)


@_q("events_anova_value_by_type", sql_anova_oneway())
def events_anova_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across event types — does the mean
    differ anywhere, and how much variance does the type explain (η²):
    exact fx group moments, per-group terms floored back to integers
    before the cross-group sums, pinned F chain
    (operators/experiment.py)."""
    ev = load_table(spark, sf_dir, "events")
    return anova_oneway(ev)


from kinesis_stream_spark.operators.experiment import (  # noqa: E402
    ab_mann_whitney,
    sql_ab_mann_whitney,
)


@_q("events_ab_mann_whitney", sql_ab_mann_whitney())
def events_ab_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum A/B readout on per-user value totals —
    the distribution-free companion to the Welch t: exact 2x-scaled
    midranks over one distributed prefix-sum exchange, exact tie
    correction, rank-biserial effect size, pinned z chain
    (operators/experiment.py)."""
    ev = load_table(spark, sf_dir, "events")
    return ab_mann_whitney(ev)


from kinesis_stream_spark.operators.experiment import (  # noqa: E402
    ab_delta_ratio,
    sql_ab_delta_ratio,
)


@_q("events_ab_delta_ratio", sql_ab_delta_ratio())
def events_ab_delta_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method z-test on the revenue-per-event RATIO metric under
    the shared md5 50/50 split — ratio denominators are random, so the
    variance charges the numerator-denominator covariance (Deng,
    Knoblich & Lu 2018); exact DECIMAL(38,0) arm moments, pinned
    finals (operators/experiment.py:ab_delta_ratio)."""
    ev = load_table(spark, sf_dir, "events")
    return ab_delta_ratio(ev)
