"""KMV (k-minimum-values / bottom-k) distinct-count sketch
(Bar-Yossef et al. 2002; Beyer et al., "On Synopses for Distinct-Value
Estimation Under Multiset Operations", SIGMOD 2007): keep the k
smallest distinct hash values of a column; the k-th smallest order
statistic of a uniform sample estimates the cardinality as
(k − 1) · H / h_(k) with H the hash-space size.

The OTHER cardinality sketch beside HyperLogLog (operators/hll.py):
where HLL keeps 2^P leading-zero ranks, KMV keeps the k concrete
bottom hashes — which makes it simultaneously a distinct-count
estimator, a uniform sample OVER THE DISTINCT VALUES (each kept hash
is one), and a set-resemblance sketch (|bottom_k(A) ∩ bottom_k(B)|
estimates Jaccard — the one-permutation cousin of the MinHash family
in operators/dedup.py). Reference scope note: the reference
(`500px/kinesis-stream`) ships no aggregation operators (opaque
payloads, `Record.scala:15`); this row extends the SURVEY §2.3 sketch
family.

Cross-engine exactness: hashes are the md5-derived 60-bit integers
(functions/hashing.py — uniform on [0, 2^60), no engine-native hash),
so the bottom-k SET is identical on both engines (distinct values ⇒
distinct hashes ⇒ no ties to break). The estimate
(k − 1) · 2^60 / h_(k) is ONE pinned float literal (the precomputed
numerator) and one IEEE divide of a BIGINT-exact denominator —
deterministic on both engines. When the column holds fewer than k
distinct values the sketch is the complete distinct-hash set and the
estimate is exactly its size (no extrapolation), per Beyer et al. §3.
The exact distinct count rides alongside so the parity row grades the
sketch's error itself.

Scale shape, per column: one map-side-combinable hash-dedup aggregate
(Spark's partial HashAggregate dedups within each partition before
the exchange, so the shuffle carries at most the per-partition-unique
hashes), then a global bottom-k via sort().limit(k) — planned as
TakeOrderedAndProject: each partition retains only ITS k smallest
rows before the single-partition merge, so nothing corpus-sized ever
sorts. The exact COUNT(DISTINCT) column exists to grade the sketch
and would be dropped at deployment scale; the column list is a
workload constant, so the Python loop builds a UNION plan of
independent branches over one cached scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_stream_spark.functions.hashing import md5_int64
from kinesis_stream_spark.operators.hll import sql_h_expr

#: sketch size: bottom-k retains this many distinct hashes
KMV_K = 256
#: hash-space size of md5_int64 (60-bit non-negative)
KMV_H = 1 << 60
#: (k − 1) · 2^60 — the whole estimate numerator as ONE pinned float
#: literal (a power of two times a small integer: exactly
#: representable, so the only rounding is the final divide)
KMV_NUM = float(KMV_K - 1) * float(KMV_H)


def kmv_distinct(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column KMV cardinality estimate next to the exact count.

    Output per column: (column_name, exact_distinct, n_sketch,
    kth_min_hash, kmv_estimate, rel_err) — n_sketch = |bottom-k| ≤ k,
    kth_min_hash the largest retained hash (the order statistic the
    estimate divides by), rel_err = (est − exact)/exact in
    pinned-order doubles (NULL when exact = 0, where the estimate is
    exactly 0 too). NULLs are skipped (COUNT(DISTINCT) semantics on
    both engines).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    outs = []
    for c in cols:
        dh = (
            df.where(F.col(c).isNotNull())
            .select(md5_int64(F.col(c).cast("string")).alias("h"))
            .distinct()
        )
        bottom = dh.orderBy("h").limit(KMV_K)
        sketch = bottom.agg(
            F.count(F.lit(1)).cast("long").alias("n_sketch"),
            F.max("h").alias("kth_min_hash"),
        )
        exact = df.agg(
            F.count_distinct(F.col(c)).cast("long").alias("exact_distinct")
        )
        est = F.when(
            F.col("n_sketch") < KMV_K, F.col("n_sketch").cast("double")
        ).otherwise(F.lit(KMV_NUM) / F.col("kth_min_hash").cast("double"))
        outs.append(
            sketch.crossJoin(exact).select(
                F.lit(c).alias("column_name"),
                "exact_distinct",
                "n_sketch",
                "kth_min_hash",
                est.alias("kmv_estimate"),
                # empty/all-NULL column: exact = 0 -> NULL rel_err by
                # contract (ANSI Spark raises on the bare divide)
                F.when(
                    F.col("exact_distinct") == 0, F.lit(None).cast("double")
                )
                .otherwise(
                    (est - F.col("exact_distinct").cast("double"))
                    / F.col("exact_distinct").cast("double")
                )
                .alias("rel_err"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def sql_kmv_distinct(table: str, cols: list[str]) -> str:
    """DuckDB oracle twin of :func:`kmv_distinct`."""
    branches = []
    for c in cols:
        branches.append(
            f"""
    SELECT '{c}' AS column_name,
           (SELECT CAST(COUNT(DISTINCT {c}) AS BIGINT) FROM {table})
             AS exact_distinct,
           CAST(COUNT(*) AS BIGINT) AS n_sketch,
           MAX(h) AS kth_min_hash,
           CASE WHEN COUNT(*) < {KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
                ELSE {KMV_NUM!r} / CAST(MAX(h) AS DOUBLE) END
             AS kmv_estimate,
           CASE WHEN (SELECT COUNT(DISTINCT {c}) FROM {table}) = 0
                THEN NULL
                ELSE (CASE WHEN COUNT(*) < {KMV_K}
                           THEN CAST(COUNT(*) AS DOUBLE)
                           ELSE {KMV_NUM!r} / CAST(MAX(h) AS DOUBLE) END
                      - CAST((SELECT COUNT(DISTINCT {c}) FROM {table})
                             AS DOUBLE))
                     / CAST((SELECT COUNT(DISTINCT {c}) FROM {table})
                            AS DOUBLE) END
             AS rel_err
    FROM (SELECT DISTINCT {sql_h_expr(c)} AS h
          FROM {table} WHERE {c} IS NOT NULL
          ORDER BY h LIMIT {KMV_K})
    """
        )
    return "SELECT * FROM (" + " UNION ALL ".join(
        f"({b})" for b in branches
    ) + ") AS kmv"
