"""Classifier-evaluation operators: exact ROC AUC and calibration.

The training-data-pipeline eval pair beside the A/B family
(``operators/experiment.py``): every model-assisted curation step
(quality scorer, language filter, near-dup classifier, reward model)
ships with a discrimination readout (does the score rank positives
above negatives — ROC AUC, Hanley & McNeil 1982, via the
Mann-Whitney U identity the ``events_ab_mann_whitney`` operator
already uses) and a calibration readout (do predicted probabilities
match observed frequencies — reliability bins + expected calibration
error, Murphy 1973; Naeini, Cooper & Hauskrecht AAAI 2015).

Reference provenance: the reference delegates all query processing to
its host framework (SURVEY.md §2.2); these are part of the
training-data-pipeline extension surface the build brief demands.

Cross-engine float discipline: scores/predictions clamp to
±``FX_V_CAP`` and floor onto the 2^20 fx grid PER ROW (the
experiment.py convention); every rank/count/gap accumulates as exact
integers from there —

- AUC's tie-corrected numerator is the EXACT integer
  ``2U = Σ_g n_pos_g · (2·cum_neg_below_g + n_neg_g)`` over distinct-
  score tie groups (midranks double to integers), so
  ``auc = 2U / (2·n_pos·n_neg)`` is ONE pinned IEEE divide;
- ECE's numerator is the EXACT integer ``Σ_b |Σpfx_b − n_pos_b·2^20|``
  (the per-bin gap ``|mean_pred − frac_pos|`` shares denominator
  ``n_b·2^20``, so the n_b/N weights cancel into one integer sum),
  and ``ece = Σ_b gap_num_b / (N·2^20)`` is ONE pinned divide.

No transcendental ever runs inside either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kinesis_stream_spark.operators.experiment import FX_V_CAP, WELCH_SCALE

#: fx grid for scores/predictions (shared spelling with the A/B family)
EVAL_SCALE = WELCH_SCALE


def _fx(col, *, scale: float) -> F.Column:
    """±FX_V_CAP clamp then 2^20 fx floor — the engine-wide saturation
    convention (experiment.py FX_V_CAP). The clamp also absorbs
    non-finite scores deterministically: BOTH engines order NaN and
    +Inf greatest (probed r12 — least(greatest(NaN,−c),c) = c on
    Spark 4.1 and DuckDB alike), so corrupt scores pin to the cap
    instead of feeding NaN through the fx floor engine-dependently."""
    return F.floor(
        F.least(
            F.greatest(col.cast("double"), F.lit(-FX_V_CAP)), F.lit(FX_V_CAP)
        )
        * F.lit(scale)
    ).cast("long")


def _label_digits(n_bins: int) -> tuple[int, int]:
    """Bin-label digit rule, ONE definition for BOTH engine twins so
    the exact string parity cannot drift (r12 second review): d =
    ⌈log10 B⌉ (≥ 1) digits and their power of ten — 10^d ≥ B keeps
    every truncated edge (k·10^d div B) distinct."""
    d = 1
    while 10**d < n_bins:
        d += 1
    return d, 10**d


def roc_auc_per_class(
    df: DataFrame,
    *,
    label_col: str,
    score_col: str,
) -> DataFrame:
    """One-vs-rest ROC AUC of ``score_col`` for EVERY class of
    ``label_col`` (Hanley & McNeil 1982): for class c, AUC = the
    probability a random class-c row outscores a random non-c row,
    ties counting half — the Mann-Whitney U identity, computed
    exactly on the fx score grid.

    Exactness: per (class, distinct fx score) tie group with
    ``n_pos_g`` positives and ``n_neg_g`` negatives and ``cum_neg_g``
    negatives strictly below, the midrank identity gives the integer

        2U = Σ_g n_pos_g · (2·cum_neg_g + n_neg_g)

    (each positive in the group beats every lower negative once and
    half-ties the group's negatives — doubling clears the half).
    ``auc = 2U / (2·n_pos·n_neg)`` is one pinned divide; the Gini
    coefficient 2·AUC − 1 = (2U − n_pos·n_neg) / (n_pos·n_neg) is
    reported ppm-exact as the integer division
    ``10⁶·(u2 − n_pos·n_neg) div (n_pos·n_neg)`` (truncating — Spark
    ``div`` and DuckDB ``//`` agree on negatives, r11-verified).
    NULL auc/gini for a one-sided class (n_pos = 0 or n_neg = 0 —
    discrimination is undefined, stated not hidden). NULL labels and
    NULL scores are excluded by contract.

    Output: one row per class — (class_label, n_pos, n_neg, u2 — the
    2U diagnostic, exact up to BIGINT max then saturated via LEAST on
    both engines (the join-cardinality clamp convention; auc/gini
    always compute from the unclamped DECIMAL) — auc, gini_ppm as
    above).

    Scale shape: ONE (class, score) counting pass over the ×C
    one-vs-rest explode (C = |classes|, a bounded small multiplier —
    the bootstrap-×B convention), a per-class ordered window over the
    DISTINCT-SCORE frame (|distinct fx scores| rows per class, not
    corpus rows), a C-row reduction. Plus one column-pruned
    dictionary scan building the broadcast class frame (inherent to
    one-vs-rest over an unknown class set — it must see the same
    qualifying rows, so it shares the score-not-null filter; stated,
    not hidden). The global single-class form at
    an unbounded score cardinality swaps the window for the
    distributed prefix sum (``operators/skew.py``) — same integers.
    DECIMAL(38,0) products guard n_pos·n_neg up to 10^19 each."""
    d38 = "decimal(38,0)"
    base = df.where(
        F.col(label_col).isNotNull() & F.col(score_col).isNotNull()
    ).select(
        F.col(label_col).alias("_cls"),
        _fx(F.col(score_col), scale=float(EVAL_SCALE)).alias("_sfx"),
    )
    classes = base.select(F.col("_cls").alias("class_label")).distinct()
    # one-vs-rest explode: every row judged against every class (×C,
    # C bounded); is_pos flags the row's own class
    tagged = base.crossJoin(F.broadcast(classes)).select(
        "class_label",
        "_sfx",
        (F.col("_cls") == F.col("class_label")).cast("int").alias("_p"),
    )
    groups = tagged.groupBy("class_label", "_sfx").agg(
        F.sum("_p").cast("long").alias("n_pos_g"),
        F.sum(F.lit(1) - F.col("_p")).cast("long").alias("n_neg_g"),
    )
    w = (
        Window.partitionBy("class_label")
        .orderBy("_sfx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = groups.select(
        "class_label",
        "n_pos_g",
        "n_neg_g",
        F.coalesce(F.sum("n_neg_g").over(w), F.lit(0))
        .cast("long")
        .alias("cum_neg_g"),
    ).select(
        "class_label",
        "n_pos_g",
        "n_neg_g",
        (
            F.col("n_pos_g").cast(d38)
            * (2 * F.col("cum_neg_g") + F.col("n_neg_g")).cast(d38)
        )
        .cast(d38)
        .alias("_u2g"),
    )
    per = contrib.groupBy("class_label").agg(
        F.sum("n_pos_g").cast("long").alias("n_pos"),
        F.sum("n_neg_g").cast("long").alias("n_neg"),
        F.sum("_u2g").cast(d38).alias("_u2"),
    )
    both = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return per.select(
        "class_label",
        "n_pos",
        "n_neg",
        # the DIAGNOSTIC u2 column saturates at BIGINT max (the
        # join-cardinality clamp convention — 2U > 2^63 needs
        # n_pos·n_neg > 2^62, reachable at corpus scale; auc/gini
        # compute from the unclamped DECIMAL _u2 either way)
        F.least(F.col("_u2"), F.lit(2**63 - 1).cast(d38))
        .cast("long")
        .alias("u2"),
        F.when(
            both,
            F.expr("cast(cast(_u2 as string) as double)")
            / (
                2.0
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")
            ),
        ).alias("auc"),
        F.when(
            both,
            F.expr(
                "cast(cast(cast(1000000 as decimal(38,0))"
                " * (_u2 - cast(n_pos as decimal(38,0)) * n_neg)"
                " div (cast(n_pos as decimal(38,0)) * n_neg)"
                " as string) as long)"
            ),
        ).alias("gini_ppm"),
    ).orderBy("class_label")


def sql_roc_auc_per_class(
    *,
    table: str,
    label_col: str,
    score_col: str,
) -> str:
    """DuckDB oracle twin of :func:`roc_auc_per_class` — identical fx
    grid, tie-group integers, and pinned divides."""
    s = float(EVAL_SCALE)
    return f"""
    WITH base AS (
      SELECT {label_col} AS _cls,
             CAST(FLOOR(LEAST(GREATEST(CAST({score_col} AS DOUBLE),
                  {-FX_V_CAP!r}), {FX_V_CAP!r}) * {s!r}) AS BIGINT) AS _sfx
      FROM {table}
      WHERE {label_col} IS NOT NULL AND {score_col} IS NOT NULL),
    classes AS (SELECT DISTINCT _cls AS class_label FROM base),
    tagged AS (
      SELECT c.class_label, b._sfx,
             CASE WHEN b._cls = c.class_label THEN 1 ELSE 0 END AS _p
      FROM base b CROSS JOIN classes c),
    groups AS (
      SELECT class_label, _sfx,
             CAST(SUM(_p) AS BIGINT) AS n_pos_g,
             CAST(SUM(1 - _p) AS BIGINT) AS n_neg_g
      FROM tagged GROUP BY 1, 2),
    contrib AS (
      SELECT class_label, n_pos_g, n_neg_g,
             CAST(COALESCE(SUM(n_neg_g) OVER (PARTITION BY class_label
                  ORDER BY _sfx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_neg_g
      FROM groups),
    per AS (
      SELECT class_label,
             CAST(SUM(n_pos_g) AS BIGINT) AS n_pos,
             CAST(SUM(n_neg_g) AS BIGINT) AS n_neg,
             CAST(SUM(CAST(n_pos_g AS HUGEINT)
                  * (2 * cum_neg_g + n_neg_g)) AS HUGEINT) AS _u2
      FROM contrib GROUP BY 1)
    SELECT class_label, n_pos, n_neg,
           CAST(LEAST(_u2, CAST(9223372036854775807 AS HUGEINT))
                AS BIGINT) AS u2,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             CAST(CAST(_u2 AS VARCHAR) AS DOUBLE)
             / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
           END AS auc,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             CAST(CAST(CAST(1000000 AS HUGEINT)
                  * (_u2 - CAST(n_pos AS HUGEINT) * n_neg)
                  // (CAST(n_pos AS HUGEINT) * n_neg)
                  AS VARCHAR) AS BIGINT)
           END AS gini_ppm
    FROM per
    ORDER BY class_label
    """


def calibration_bins(
    df: DataFrame,
    *,
    label_col: str,
    pred_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + expected calibration error (Murphy 1973;
    ECE per Naeini-Cooper-Hauskrecht AAAI 2015): equal-width bins on
    the predicted probability, per-bin mean prediction vs observed
    positive rate, and the n_b/N-weighted absolute-gap total.

    Predictions are clamped to [0, 1] (a calibration curve is
    undefined outside it — out-of-range model outputs saturate, the
    standard treatment) and floored onto the 2^20 fx grid; labels
    must be 0/1 integers (NULL label or prediction rows are excluded
    by contract). Bin b = min(⌊p·B⌋, B−1), so p = 1.0 lands in the
    last bin.

    Exactness: per bin the gap |mean_pred − frac_pos| =
    |Σpfx − n_pos·2^20| / (n·2^20) has an INTEGER numerator, and the
    ECE weights cancel the per-bin denominators:

        ece = Σ_b (n_b/N)·gap_b = (Σ_b |Σpfx_b − n_pos_b·2^20|)
                                  / (N·2^20)

    — one exact integer total, ONE pinned divide. Per-bin mean_pred /
    frac_pos are each one pinned divide over exact integers.

    Output: one row per NON-EMPTY bin — (bin_label = '[lo,hi)'
    string; edges print with ⌈log10 B⌉ digits from INTEGER
    arithmetic (truncated k·10^d div B — 10^d ≥ B keeps labels
    distinct at any B, and no engine float-formatter rounding can
    ever disagree), n, n_pos, mean_pred, frac_pos, abs_gap) — plus a
    '__total__' row (the join-cardinality convention) where n/n_pos
    are corpus totals, mean_pred/frac_pos the overall means, and
    abs_gap IS the ECE. Empty input: just the '__total__' row with
    n = 0 and NULL means.

    Scale shape: ONE map-side-combinable (bin) counting pass over the
    corpus — the ≤B-row bin frame is the only thing that crosses the
    exchange — then the '__total__' fold runs over that frame via a
    tag-explode (≤2B rows + a literal seed) and one label groupBy,
    never a second corpus branch (plan-pinned: exactly one FileScan;
    the union-of-two-aggregates form re-scanned the corpus — r12 plan
    audit). No window, no join, no skew surface."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    b = int(n_bins)
    s = float(EVAL_SCALE)
    scale_i = int(EVAL_SCALE)
    d38 = "decimal(38,0)"
    pfx = F.floor(
        F.least(
            F.greatest(F.col(pred_col).cast("double"), F.lit(0.0)), F.lit(1.0)
        )
        * F.lit(s)
    ).cast("long")
    rows = df.where(
        F.col(label_col).isNotNull() & F.col(pred_col).isNotNull()
    ).select(
        pfx.alias("_pfx"),
        F.col(label_col).cast("long").alias("_y"),
    )
    # bin from the fx grid (not the raw double) so the bin edge and
    # the mean share one rounding: b = min(pfx*B div 2^20, B-1)
    binned = rows.select(
        F.least(
            F.expr(f"(_pfx * {b}) div {scale_i}"), F.lit(b - 1)
        ).alias("_bin"),
        "_pfx",
        "_y",
    )
    per = binned.groupBy("_bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_y").cast("long").alias("n_pos"),
        F.sum(F.col("_pfx").cast(d38)).cast(d38).alias("_spfx"),
    )
    gap_num = F.abs(
        F.col("_spfx") - (F.col("n_pos").cast(d38) * F.lit(scale_i)).cast(d38)
    ).cast(d38)
    per2 = per.select(
        "_bin", "n", "n_pos", "_spfx", gap_num.alias("_gap_num")
    )
    dbl = "cast(cast(_spfx as string) as double)"
    gdbl = "cast(cast(_gap_num as string) as double)"
    # bin edges rendered from INTEGER arithmetic, never an engine's
    # float formatter (format_number rounds HALF_UP, fmt half-even —
    # a cross-engine tie break at edges like 1/40; r12 review)
    dgt, p10 = _label_digits(b)

    def _edge(kexpr: str):
        return (
            f"concat(cast((({kexpr}) * {p10}) div {b} div {p10} as string),"
            f" '.', lpad(cast((({kexpr}) * {p10}) div {b} % {p10}"
            f" as string), {dgt}, '0'))"
        )

    # ONE corpus pass (r12 plan audit): deriving the '__total__' row
    # from a second aggregate over per2 re-executed per2's whole
    # lineage — two FileScans, no ReusedExchange — so the fold runs
    # over the ≤B-row bin frame instead: each bin row explodes into
    # itself + a '__total__'-tagged copy (≤2B rows) and ONE label
    # groupBy folds both. A literal zero seed row (no corpus scan)
    # keeps the empty-input contract: the '__total__' row survives
    # with n = 0 and NULL means.
    tagged = per2.select(
        "*", F.explode(F.array(F.lit(0), F.lit(1))).alias("_tot")
    ).select(
        F.when(F.col("_tot") == 1, F.lit("__total__"))
        .otherwise(
            F.expr(
                f"concat('[', {_edge('_bin')}, ',', {_edge('_bin + 1')}, ')')"
            )
        )
        .alias("bin_label"),
        "n",
        "n_pos",
        "_spfx",
        "_gap_num",
    )
    seed = (
        tagged.sparkSession.range(1).select(
            F.lit("__total__").alias("bin_label"),
            F.lit(0).cast("long").alias("n"),
            F.lit(0).cast("long").alias("n_pos"),
            F.lit(0).cast(d38).alias("_spfx"),
            F.lit(0).cast(d38).alias("_gap_num"),
        )
    )
    folded = (
        tagged.unionByName(seed)
        .groupBy("bin_label")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("n_pos").cast("long").alias("n_pos"),
            F.sum("_spfx").cast(d38).alias("_spfx"),
            F.sum("_gap_num").cast(d38).alias("_gap_num"),
        )
    )
    return folded.select(
        "bin_label",
        "n",
        "n_pos",
        F.when(F.col("n") > 0, F.expr(f"{dbl} / (cast(n as double) * {s!r})"))
        .alias("mean_pred"),
        F.when(
            F.col("n") > 0,
            F.col("n_pos").cast("double") / F.col("n").cast("double"),
        ).alias("frac_pos"),
        F.when(
            F.col("n") > 0, F.expr(f"{gdbl} / (cast(n as double) * {s!r})")
        ).alias("abs_gap"),
    ).orderBy("bin_label")


def sql_calibration_bins(
    *,
    table: str,
    label_col: str,
    pred_col: str,
    n_bins: int = 10,
) -> str:
    """DuckDB oracle twin of :func:`calibration_bins` — identical
    clamp, fx grid, bin rule, integer gap numerators, and divides."""
    b = int(n_bins)
    s = float(EVAL_SCALE)
    scale_i = int(EVAL_SCALE)
    d_lbl, p10 = _label_digits(b)
    return f"""
    WITH rows_t AS (
      SELECT CAST(FLOOR(LEAST(GREATEST(CAST({pred_col} AS DOUBLE), 0.0),
                  1.0) * {s!r}) AS BIGINT) AS _pfx,
             CAST({label_col} AS BIGINT) AS _y
      FROM {table}
      WHERE {label_col} IS NOT NULL AND {pred_col} IS NOT NULL),
    binned AS (
      SELECT LEAST((_pfx * {b}) // {scale_i}, {b - 1}) AS _bin, _pfx, _y
      FROM rows_t),
    per AS (
      SELECT _bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(_y) AS BIGINT) AS n_pos,
             CAST(SUM(CAST(_pfx AS HUGEINT)) AS HUGEINT) AS _spfx,
             ABS(CAST(SUM(CAST(_pfx AS HUGEINT)) AS HUGEINT)
                 - CAST(SUM(_y) AS HUGEINT) * {scale_i}) AS _gap_num
      FROM binned GROUP BY 1),
    bins_out AS (
      SELECT '[' || CAST(((_bin) * {p10}) // {b} // {p10} AS VARCHAR)
             || '.' || LPAD(CAST(((_bin) * {p10}) // {b} % {p10}
                AS VARCHAR), {d_lbl}, '0')
             || ',' || CAST(((_bin + 1) * {p10}) // {b} // {p10} AS VARCHAR)
             || '.' || LPAD(CAST(((_bin + 1) * {p10}) // {b} % {p10}
                AS VARCHAR), {d_lbl}, '0')
             || ')' AS bin_label,
             n, n_pos,
             CAST(CAST(_spfx AS VARCHAR) AS DOUBLE)
               / (CAST(n AS DOUBLE) * {s!r}) AS mean_pred,
             CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
             CAST(CAST(_gap_num AS VARCHAR) AS DOUBLE)
               / (CAST(n AS DOUBLE) * {s!r}) AS abs_gap
      FROM per),
    tot AS (
      SELECT COALESCE(CAST(SUM(n) AS BIGINT), 0) AS n,
             COALESCE(CAST(SUM(n_pos) AS BIGINT), 0) AS n_pos,
             COALESCE(CAST(SUM(_spfx) AS HUGEINT), 0) AS _spfx,
             COALESCE(CAST(SUM(_gap_num) AS HUGEINT), 0) AS _gap_num
      FROM per),
    tot_out AS (
      SELECT '__total__' AS bin_label, n, n_pos,
             CASE WHEN n > 0 THEN CAST(CAST(_spfx AS VARCHAR) AS DOUBLE)
               / (CAST(n AS DOUBLE) * {s!r}) END AS mean_pred,
             CASE WHEN n > 0 THEN CAST(n_pos AS DOUBLE)
               / CAST(n AS DOUBLE) END AS frac_pos,
             CASE WHEN n > 0 THEN CAST(CAST(_gap_num AS VARCHAR) AS DOUBLE)
               / (CAST(n AS DOUBLE) * {s!r}) END AS abs_gap
      FROM tot)
    SELECT * FROM bins_out
    UNION ALL
    SELECT * FROM tot_out
    ORDER BY bin_label
    """
