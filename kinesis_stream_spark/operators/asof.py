"""First-class AS-OF join (point-in-time correct temporal join).

Reference analog: kinesis-stream's per-shard ordered merge delivers
records in event order and leaves temporal correlation to user code
(`Record.scala:15`, SURVEY §1.1/§2.2); this operator is that user-side
staple — "for each left event, the latest right event at or before it"
— promoted to a first-class surface (VERDICT r10 item #6: the recipe
lived inside queries/relational.py's last-click query; the operator
form adds direction, tolerance, and left-outer semantics).

Why not the join+filter+row_number form here: that form multiplies
rows by the candidate count per key before pruning (fine as a DuckDB
oracle at sf0.01, quadratic-ish per key at 100 TB). The union-window
form never materializes a candidate pair: tag both sides, sort each
key's timeline once, and carry the most recent right row forward with
a running ``last(..., ignorenulls)`` — ONE hash exchange on the key,
zero joins, output exactly |left|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DIRECTIONS = ("backward", "forward")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
    right_vals: tuple[str, ...] = (),
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row: the single right row with the same ``on``
    key and the nearest ``right_ts`` at-or-before ``left_ts``
    (``backward``, inclusive) or at-or-after it (``forward``,
    inclusive), optionally within ``tolerance_us`` microseconds.
    LEFT-OUTER semantics: every qualifying left row survives; rows
    with no (in-tolerance) match carry NULL matched columns.

    Determinism contract: among right rows tied on (key, right_ts)
    the LARGEST ``right_id`` wins, both directions — a total order,
    so re-runs, retries, and the DuckDB oracle pick the same row.
    ``right_id`` must be a type whose ordering agrees across engines
    (integers, ASCII strings); it is compared in its NATIVE type,
    never cast. For "largest right_id" to name ONE row, ``right_id``
    must be UNIQUE within each (key, right_ts) group (a globally
    unique row id trivially satisfies this): with duplicates, Spark's
    running last() and the oracle's ROW_NUMBER each pick an
    engine-arbitrary row among the tied-id duplicates, whose
    ``right_vals`` may differ — the contract, not the engines,
    guarantees determinism (ADVICE r11).
    Left/right rows with a NULL key or timestamp are excluded (an
    equi-join key carries no NULL matches; a row without event time
    has no place on the timeline); NULL ``right_id`` rows are
    excluded from the right side for the same reason.

    Output: every left column, plus ``asof_<right_id>``,
    ``asof_<right_ts>``, and ``asof_<v>`` for each ``right_vals``
    entry — taken atomically from ONE matched row (struct-carried,
    never column-wise last()s that could mix rows).

    Scale shape: union the tagged sides, ONE hash exchange +
    per-key sort, a running ``last(struct, ignorenulls)`` over
    rows-between(unbounded-preceding, current), filter back to left
    rows — no join node in the plan (pinned), output exactly the
    qualifying left rows. At 100 TB the single skew surface is a hot
    key's timeline landing on one reducer; the documented recipe is
    coarse time-bucket pre-partitioning with boundary replication
    (split each hot key by month, replicate the last in-bucket right
    row into the next bucket) — same operator semantics, bounded
    reducers."""
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}")
    if tolerance_us is not None and tolerance_us < 0:
        raise ValueError(f"tolerance_us must be >= 0, got {tolerance_us}")
    out_names = [f"asof_{right_id}", f"asof_{right_ts}"] + [
        f"asof_{v}" for v in right_vals
    ]
    dupes = {n for n in out_names if out_names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate asof output columns: {dupes}")
    clash = set(out_names) & set(left.columns)
    if clash:
        raise ValueError(f"left already has asof output columns: {clash}")

    lcols = left.columns
    # the tie-break column keeps right_id's NATIVE type (casting to
    # long would NULL string ids non-ANSI / raise under ANSI and break
    # the documented total order); the ordering must agree with the
    # oracle's — integers and ASCII strings do (byte-wise both
    # engines), which the contract requires of right_id. Resolve the
    # type through the analyzer (select), not StructType[...] — the
    # latter is case-sensitive while column resolution is not.
    rid_type = right.select(right_id).schema[0].dataType
    lhs = left.where(
        F.col(on).isNotNull() & F.col(left_ts).isNotNull()
    ).select(
        F.col(on).alias("_k"),
        F.expr(f"unix_micros(cast({left_ts} as timestamp))").alias("_us"),
        F.lit(0).alias("_r"),
        F.lit(None).cast(rid_type).alias("_rid"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
    )
    rhs = right.where(
        F.col(on).isNotNull()
        & F.col(right_ts).isNotNull()
        & F.col(right_id).isNotNull()
    ).select(
        F.col(on).alias("_k"),
        F.expr(f"unix_micros(cast({right_ts} as timestamp))").alias("_us"),
        F.lit(1).alias("_r"),
        F.col(right_id).alias("_rid"),
        F.struct(
            F.expr(f"unix_micros(cast({right_ts} as timestamp))").alias(
                "_rus"
            ),
            F.col(right_id).alias("_id"),
            F.col(right_ts).alias("_ts"),
            *[F.col(v).alias(f"_v_{v}") for v in right_vals],
        ).alias("_rrow"),
    )
    u = lhs.unionByName(rhs, allowMissingColumns=True)

    # Ordering puts, for each left row, every matchable right row
    # strictly before it in the frame: ts asc for backward (nearest
    # past right is the LAST seen), ts desc for forward (nearest
    # future right is the last seen when walking backward from the
    # end). At equal ts the right row sorts before the left (the
    # bound is inclusive), and tied right rows sort id-asc so the
    # running last() lands on the largest id.
    ts_key: Column = (
        F.col("_us").asc() if direction == "backward" else F.col("_us").desc()
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_key, F.col("_r").desc(), F.col("_rid").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "_m", F.last("_rrow", ignorenulls=True).over(w)
    ).where(F.col("_r") == 0)

    if tolerance_us is None:
        in_tol = F.col("_m").isNotNull()
    elif direction == "backward":
        in_tol = F.col("_m").isNotNull() & (
            F.col("_us") - F.col("_m._rus") <= F.lit(int(tolerance_us))
        )
    else:
        in_tol = F.col("_m").isNotNull() & (
            F.col("_m._rus") - F.col("_us") <= F.lit(int(tolerance_us))
        )
    keep = F.when(in_tol, F.col("_m"))
    return matched.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        keep.getField("_id").alias(f"asof_{right_id}"),
        keep.getField("_ts").alias(f"asof_{right_ts}"),
        *[
            keep.getField(f"_v_{v}").alias(f"asof_{v}")
            for v in right_vals
        ],
    )


def sql_asof_join(
    *,
    left_sql: str,
    right_sql: str,
    on: str,
    left_id: str,
    left_cols: tuple[str, ...],
    left_ts: str,
    right_ts: str,
    right_id: str,
    right_vals: tuple[str, ...] = (),
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> str:
    """DuckDB oracle twin of :func:`asof_join` — the candidate-pair +
    ROW_NUMBER form (fine at oracle scale, exactly the shape the
    operator's union-window plan exists to avoid at 100 TB).
    ``left_sql`` / ``right_sql`` are subqueries producing the two
    sides; ``left_id`` is a left row key that must be UNIQUE and
    NON-NULL among qualifying left rows — it is both the rn
    partition and the re-join key, and a NULL ``left_id`` row would
    silently lose its match through the equi-join (ADVICE r11). The
    lq CTE filters ``left_id IS NOT NULL`` so a contract violation
    surfaces as a LOUD row-count mismatch against the Spark operator
    (which has no left_id concept) instead of a silent NULL-columns
    hash divergence. Identical match set, inclusive bounds,
    tolerance, and largest-right-id tie-break."""
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}")
    cmp_op = "<=" if direction == "backward" else ">="
    tol = ""
    if tolerance_us is not None:
        diff = (
            f"EPOCH_US(l.{left_ts}) - EPOCH_US(r.{right_ts})"
            if direction == "backward"
            else f"EPOCH_US(r.{right_ts}) - EPOCH_US(l.{left_ts})"
        )
        tol = f" AND {diff} <= {int(tolerance_us)}"
    order = (
        f"EPOCH_US(r.{right_ts}) DESC, r.{right_id} DESC"
        if direction == "backward"
        else f"EPOCH_US(r.{right_ts}) ASC, r.{right_id} DESC"
    )
    lsel = ", ".join(f"l.{c}" for c in left_cols)
    osel = ", ".join(f"o.{c}" for c in left_cols)
    rsel = ", ".join(
        [f"r.{right_id} AS asof_{right_id}", f"r.{right_ts} AS asof_{right_ts}"]
        + [f"r.{v} AS asof_{v}" for v in right_vals]
    )
    psel = ", ".join(
        [f"p.asof_{right_id}", f"p.asof_{right_ts}"]
        + [f"p.asof_{v}" for v in right_vals]
    )
    return f"""
    WITH lq AS (SELECT * FROM ({left_sql})
                WHERE {on} IS NOT NULL AND {left_ts} IS NOT NULL
                  AND {left_id} IS NOT NULL),
    rq AS (SELECT * FROM ({right_sql})
           WHERE {on} IS NOT NULL AND {right_ts} IS NOT NULL
             AND {right_id} IS NOT NULL),
    pairs AS (
      SELECT l.{left_id} AS _lid, {rsel},
             ROW_NUMBER() OVER (PARTITION BY l.{left_id}
                                ORDER BY {order}) AS _rn
      FROM lq l JOIN rq r
        ON l.{on} = r.{on}
       AND EPOCH_US(r.{right_ts}) {cmp_op} EPOCH_US(l.{left_ts}){tol})
    SELECT {osel}, {psel}
    FROM lq o LEFT JOIN (SELECT * FROM pairs WHERE _rn = 1) p
      ON o.{left_id} = p._lid
    """
