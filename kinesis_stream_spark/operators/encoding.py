"""Categorical feature encodings for ML training pipelines.

Reference analog: none — kinesis-stream hands decoded records to user
code (`Record.scala:15`, SURVEY §2.2); feature engineering is that
user side, re-expressed declaratively. Public-literature basis:
Micci-Barreca, "A Preprocessing Scheme for High-Cardinality
Categorical Attributes" (SIGKDD Explorations 2001) — smoothed target
encoding; the leave-one-out variant is the standard leakage guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the engine-wide 2^20 fixed-point quantization
ENC_SCALE = 1 << 20


def target_encoding(
    df: DataFrame,
    *,
    id_col: str,
    category_col: str,
    target_col: str,
    smoothing: int = 10,
) -> DataFrame:
    """Leave-one-out smoothed target encoding — replace a categorical
    column with "the mean target of the OTHER rows in my category,
    shrunk toward the global mean":

        enc_i = (Σ_cat − y_i + m·ȳ_global) / (n_cat − 1 + m)

    Leave-one-out (drop y_i from its own encoding) is the leakage
    guard — with y_i included, the encoding memorizes each row's own
    label and the downstream model overfits silently; the smoothing
    pseudo-count m shrinks rare categories toward the prior
    (Micci-Barreca 2001).

    Exactness: targets quantize to 2^20-fx BIGINTs; clearing the
    global-mean fraction gives the exact integer form

        enc_i = (N·(Σcat_fx − y_fx) + m·Σall_fx) / (N·(n_cat − 1 + m))

    — DECIMAL(38,0) numerator and denominator (N·Σ products overflow
    BIGINT near 10^10 rows), VARCHAR-routed, ONE pinned double divide,
    then the single power-of-two rescale. Identical on both engines.

    Contract: rows with a NULL id, category, or target are excluded —
    the encoding is defined on labeled rows (score-time encoding of
    unlabeled/unseen rows joins the category means with a prior
    fallback; that is a different, non-LOO operator). A singleton
    category with m = 0 has an empty leave-out set — NULL encoding,
    stated not hidden.

    Output: one row per qualifying input row — (id, category, target,
    encoded).

    Scale shape: ONE map-side-combinable per-category count/sum pass,
    a broadcast 1-row global REDUCED FROM that keys-sized frame (the
    corpus is never aggregated twice), and one hash join of the
    category frame back to the rows (Catalyst broadcasts it when
    small). No window, no per-row UDF; skew rides the category join
    key exactly like any group-by — the usual salting recipe applies
    past ~10^8 rows per category."""
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    m = int(smoothing)
    d38 = "decimal(38,0)"
    rows = df.where(
        F.col(id_col).isNotNull()
        & F.col(category_col).isNotNull()
        & F.col(target_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.col(category_col).alias("category"),
        F.col(target_col).alias("target"),
        F.floor(F.col(target_col) * F.lit(float(ENC_SCALE)))
        .cast("long")
        .alias("yfx"),
    )
    cat = rows.groupBy("category").agg(
        F.count(F.lit(1)).cast("long").alias("n_cat"),
        F.sum(F.col("yfx").cast(d38)).cast(d38).alias("scat"),
    )
    # global moments reduce from the keys-sized category frame (exact
    # integer sums — bit-identical), never a second corpus aggregate
    glob = cat.groupBy().agg(
        F.coalesce(F.sum("n_cat"), F.lit(0)).cast("long").alias("n_all"),
        F.coalesce(F.sum("scat"), F.lit(0).cast(d38))
        .cast(d38)
        .alias("sall"),
    )
    j = rows.join(cat, "category").crossJoin(F.broadcast(glob))
    num = F.expr(
        f"cast(cast(cast(n_all as decimal(38,0)) * (scat - yfx)"
        f" + {m} * sall as string) as double)"
    )
    den = F.expr(
        f"cast(cast(cast(n_all as decimal(38,0))"
        f" * (n_cat - 1 + {m}) as string) as double)"
    )
    return j.select(
        "id",
        "category",
        "target",
        F.when(
            F.col("n_cat") - 1 + F.lit(m) > 0,
            num / den / F.lit(float(ENC_SCALE)),
        ).alias("encoded"),
    )


def sql_target_encoding(
    *,
    table: str,
    id_col: str,
    category_col: str,
    target_col: str,
    smoothing: int = 10,
) -> str:
    """DuckDB oracle twin of :func:`target_encoding` — identical fx
    quantization, exact integer numerator/denominator, pinned
    divides."""
    m = int(smoothing)
    s = float(ENC_SCALE)
    return f"""
    WITH rows_t AS (
      SELECT {id_col} AS id, {category_col} AS category,
             {target_col} AS target,
             CAST(FLOOR({target_col} * {s!r}) AS BIGINT) AS yfx
      FROM {table}
      WHERE {id_col} IS NOT NULL AND {category_col} IS NOT NULL
        AND {target_col} IS NOT NULL),
    cat AS (
      SELECT category, CAST(COUNT(*) AS BIGINT) AS n_cat,
             CAST(SUM(CAST(yfx AS HUGEINT)) AS HUGEINT) AS scat
      FROM rows_t GROUP BY category),
    gl AS (
      SELECT COALESCE(CAST(SUM(n_cat) AS BIGINT), 0) AS n_all,
             COALESCE(CAST(SUM(scat) AS HUGEINT), 0) AS sall
      FROM cat)
    SELECT r.id, r.category, r.target,
           CASE WHEN c.n_cat - 1 + {m} > 0 THEN
             CAST(CAST(CAST(g.n_all AS HUGEINT) * (c.scat - r.yfx)
                       + {m} * g.sall AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(g.n_all AS HUGEINT)
                         * (c.n_cat - 1 + {m}) AS VARCHAR) AS DOUBLE)
             / {s!r}
           END AS encoded
    FROM rows_t r
    JOIN cat c USING (category)
    CROSS JOIN gl g
    """
