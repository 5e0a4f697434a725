"""Skew-mitigation primitives: salted two-phase aggregation.

The runbook prescribes "salt the key, aggregate twice" wherever a hot
key would overload one reducer (empty-doc hashes, boilerplate bands,
celebrity users). This module makes that prescription a first-class,
tested operator instead of a docstring aside.

Semantics are EXACTLY those of the direct aggregation — the salt only
changes the physical shuffle: phase 1 groups on (key, salt) so a hot
key's rows spread over ``n_salts`` reducers and are partially reduced
there; phase 2 re-aggregates the ≤ n_salts partial rows per key. Counts
add exactly; sums accumulate in exact DECIMAL (queries/_util.py
discipline), so the two-phase result is bit-identical to the one-phase
one and to any SQL oracle's plain GROUP BY.

The salt is md5-derived from a row identity column — deterministic, so
re-runs and retries aggregate identically (a random salt would too, but
determinism keeps every layer of this engine replayable).

At 100 TB: use for aggregations whose key histogram is unknown or known
hot. Cost when keys are uniform: one extra (tiny) shuffle of n_keys ×
n_salts partial rows. AQE's skew handling covers JOINs; aggregation
skew is the caller's job — this is the tool.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesis_stream_spark.functions.hashing import md5_int64

DEC = "decimal(27,6)"


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    *,
    salt_col: Column | str,
    sum_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase (count, exact-decimal sum, min, max) aggregation per
    ``key_cols``, salted on ``md5(salt_col) % n_salts``.

    Returns one row per key: (``*key_cols``, n_rows, sum_<sum_col>,
    min_<sum_col>, max_<sum_col>) — identical values to the direct
    single-shuffle aggregation, resilient to any key-frequency skew.
    """
    salt_src = F.col(salt_col) if isinstance(salt_col, str) else salt_col
    salt = (md5_int64(salt_src.cast("string")) % n_salts).alias("_salt")
    partial = (
        df.select(*key_cols, salt, F.col(sum_col).alias("_v"))
        .groupBy(*key_cols, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("_v").cast(DEC)).alias("_s"),
            F.min("_v").alias("_mn"),
            F.max("_v").alias("_mx"),
        )
    )
    return (
        partial.groupBy(*key_cols)
        .agg(
            F.sum("_n").cast("long").alias("n_rows"),
            F.sum("_s").cast("double").alias(f"sum_{sum_col}"),
            F.min("_mn").alias(f"min_{sum_col}"),
            F.max("_mx").alias(f"max_{sum_col}"),
        )
    )
