"""HyperLogLog distinct-count sketch (Flajolet et al. 2007): fixed-size
cardinality summary per column, checked against the exact count.

The COUNT(DISTINCT) replacement at 100 TB: the sketch is m = 2^P
BIGINT registers — KB-sized — built in one map-side-combinable
aggregate (register-wise MAX), mergeable across any partitioning and
across days/streams (MAX commutes), where the exact distinct needs a
full shuffle of the distinct key set. Reference scope note: the
reference (`500px/kinesis-stream`) ships no aggregation operators
(opaque payloads, `Record.scala:15`); this completes the sketch family
(Count-Min point frequency in operators/cms.py) with the cardinality
sketch.

Cross-engine exactness: the value hash is the md5-derived 60-bit
integer (functions/hashing.py discipline — no engine-native hash);
register index = low P bits, rho = leading-zero rank of the remaining
W = 60 − P bits computed as ``W + 1 − LENGTH(BIN(w))`` (both engines
print minimal binary digits; w = 0 ⇒ rho = W + 1). The harmonic-mean
denominator Σ 2^(−M[j]) is EXACT integer arithmetic: scaled by 2^(W+1)
it is Σ 2^(W+1−M[j]) — BIGINT shifts, never floats — with every
never-hit register contributing 2^(W+1). Worst case m·2^(W+1) = 2^61
fits BIGINT. The estimate α·m²·2^(W+1) / S is then ONE float literal
(precomputed numerator) and one IEEE divide — deterministic on both
engines. The small-range linear-counting correction (m·ln(m/V)) needs
a transcendental, so ln never runs in-engine: the m-entry m·ln(m/V)
table is precomputed in Python and injected as LITERALS into both
plans (the evaluation-operator discount-table pattern), making the
correction a pure lookup on the zero-register count V. The exact
distinct rides alongside in the parity row, so the sketch's error is
itself oracle-checked.

Scale shape: per column, one map-side-combinable (register → MAX rho)
aggregate over the corpus, then an m-row reduction to one row; the
column list is a workload constant, so the Python loop builds a UNION
plan of independent branches. The exact COUNT(DISTINCT) column exists
to grade the sketch and would be dropped at deployment scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_stream_spark.functions.hashing import md5_int64, sql_md5_int64

#: register-index bits: m = 2^P registers
HLL_P = 10
HLL_M = 1 << HLL_P
#: hash bits left for the rho rank (md5_int64 is 60-bit)
HLL_W = 60 - HLL_P

#: α_m · m² · 2^(W+1) — the whole estimate numerator as ONE pinned
#: float literal (α_m for m ≥ 128 is 0.7213/(1 + 1.079/m); m² · 2^(W+1)
#: is a power of two, so the only rounding is the final multiply)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_NUM = HLL_ALPHA * float(HLL_M) * float(HLL_M) * float(1 << (HLL_W + 1))

#: small-range (linear-counting) correction table: LIN[V] = m·ln(m/V)
#: for V = 1..m zero registers, precomputed in Python and injected as
#: LITERALS into both engines (the evaluation-operator discount-table
#: pattern) — ln is transcendental, so it must never run in-engine.
#: Applied when raw_est ≤ 2.5·m and V > 0, per Flajolet et al. §4.
import math as _math

HLL_LIN = tuple(
    float(HLL_M) * _math.log(float(HLL_M) / float(v))
    for v in range(1, HLL_M + 1)
)
HLL_SMALL_CUT = 2.5 * float(HLL_M)


def hll_distinct(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column HLL cardinality estimate next to the exact count.

    Output per column: (column_name, n_rows, exact_distinct,
    n_registers_hit, zero_registers, harmonic_sum_fx, raw_estimate,
    hll_estimate, rel_err) — harmonic_sum_fx is the exact integer
    Σ 2^(W+1−M[j]); hll_estimate applies the linear-counting lookup
    when raw_estimate ≤ 2.5·m and zero registers exist (measured here:
    l_suppkey at sf0.1 goes +35% raw → ~0% corrected); rel_err =
    (est − exact)/exact in pinned-order doubles. NULLs are skipped
    (COUNT(DISTINCT) semantics on both engines).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    outs = []
    for c in cols:
        h = md5_int64(F.col(c).cast("string"))
        regs = df.where(F.col(c).isNotNull()).select(h.alias("h"))
        w = F.expr(f"shiftright(h, {HLL_P})")
        rho = (
            F.when(w == 0, F.lit(HLL_W + 1))
            .otherwise(F.lit(HLL_W + 1) - F.length(F.expr(f"bin(shiftright(h, {HLL_P}))")))
            .cast("int")
        )
        reg = (
            regs.select((F.col("h") % HLL_M).alias("j"), rho.alias("rho"))
            .groupBy("j")
            .agg(F.max("rho").alias("m"))
        )
        sketch = reg.agg(
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_W + 1} - m)")
            ).alias("s_hit"),
            F.count(F.lit(1)).cast("long").alias("n_hit"),
        )
        exact = df.agg(
            F.count(F.col(c)).cast("long").alias("n_rows"),
            F.count_distinct(F.col(c)).cast("long").alias("exact_distinct"),
        )
        s_fx = (
            F.coalesce(F.col("s_hit"), F.lit(0))
            + (F.lit(HLL_M) - F.col("n_hit"))
            * F.lit(1 << (HLL_W + 1)).cast("long")
        ).cast("long")
        raw = F.lit(HLL_NUM) / s_fx.cast("double")
        v_zero = (F.lit(HLL_M) - F.col("n_hit")).cast("long")
        # small-range correction: the V-indexed m·ln(m/V) literal table
        # (1-based element_at; V ≤ m by construction)
        lin = F.element_at(
            F.array(*[F.lit(x) for x in HLL_LIN]), v_zero.cast("int")
        )
        est = F.when(
            (v_zero > 0) & (raw <= F.lit(HLL_SMALL_CUT)), lin
        ).otherwise(raw)
        outs.append(
            sketch.crossJoin(exact).select(
                F.lit(c).alias("column_name"),
                "n_rows",
                "exact_distinct",
                F.col("n_hit").alias("n_registers_hit"),
                v_zero.alias("zero_registers"),
                s_fx.alias("harmonic_sum_fx"),
                raw.alias("raw_estimate"),
                est.alias("hll_estimate"),
                (
                    (est - F.col("exact_distinct").cast("double"))
                    / F.col("exact_distinct").cast("double")
                ).alias("rel_err"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def sql_h_expr(col: str) -> str:
    """The oracle's 60-bit value hash (md5_int64 twin)."""
    return sql_md5_int64(f"CAST({col} AS VARCHAR)")


def sql_hll_distinct(table: str, cols: list[str]) -> str:
    """DuckDB oracle twin of :func:`hll_distinct` — identical hashing,
    register MAX, exact integer harmonic sum, the same single pinned
    float numerator literal, and the same injected m·ln(m/V)
    linear-counting table (1-based list_extract)."""
    # exponent notation, NOT repr: DuckDB parses a plain decimal
    # literal as DECIMAL and the later DECIMAL→DOUBLE conversion
    # double-rounds (1 ULP off Spark's exact float literal); an
    # exponent forces DOUBLE, and 17 significant digits round-trip
    lin_list = "[" + ", ".join(f"{x:.17e}" for x in HLL_LIN) + "]"
    selects = []
    for c in cols:
        h = sql_h_expr(c)
        selects.append(
            f"""
        SELECT column_name, n_rows, exact_distinct, n_registers_hit,
               zero_registers, harmonic_sum_fx, raw_estimate,
               CASE WHEN zero_registers > 0
                         AND raw_estimate <= {HLL_SMALL_CUT!r}
                    THEN list_extract({lin_list},
                                      CAST(zero_registers AS INT))
                    ELSE raw_estimate END AS hll_estimate,
               (CASE WHEN zero_registers > 0
                          AND raw_estimate <= {HLL_SMALL_CUT!r}
                     THEN list_extract({lin_list},
                                       CAST(zero_registers AS INT))
                     ELSE raw_estimate END
                - CAST(exact_distinct AS DOUBLE))
                 / CAST(exact_distinct AS DOUBLE) AS rel_err
        FROM (
          SELECT '{c}' AS column_name, e.n_rows, e.exact_distinct,
                 s.n_hit AS n_registers_hit,
                 CAST({HLL_M} - s.n_hit AS BIGINT) AS zero_registers,
                 CAST(COALESCE(s.s_hit, 0)
                      + ({HLL_M} - s.n_hit)
                        * (CAST(1 AS BIGINT) << {HLL_W + 1}) AS BIGINT)
                   AS harmonic_sum_fx,
                 {HLL_NUM!r} / CAST(COALESCE(s.s_hit, 0)
                      + ({HLL_M} - s.n_hit)
                        * (CAST(1 AS BIGINT) << {HLL_W + 1}) AS DOUBLE)
                   AS raw_estimate
          FROM (
            SELECT CAST(SUM(CAST(1 AS BIGINT) << ({HLL_W + 1} - m)) AS BIGINT)
                     AS s_hit,
                   CAST(COUNT(*) AS BIGINT) AS n_hit
            FROM (
              SELECT hv % {HLL_M} AS j,
                     MAX(CASE WHEN (hv >> {HLL_P}) = 0 THEN {HLL_W + 1}
                         ELSE {HLL_W + 1} - LENGTH(BIN(hv >> {HLL_P}))
                         END) AS m
              FROM (SELECT {h} AS hv FROM {table} WHERE {c} IS NOT NULL)
              GROUP BY 1
            )
          ) s
          CROSS JOIN (
            SELECT CAST(COUNT({c}) AS BIGINT) AS n_rows,
                   CAST(COUNT(DISTINCT {c}) AS BIGINT) AS exact_distinct
            FROM {table}
          ) e
        )"""
        )
    return " UNION ALL ".join(selects)
