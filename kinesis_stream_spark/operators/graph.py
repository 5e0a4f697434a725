"""PageRank with exact integer fixed-point arithmetic.

The iterative-algorithm counterpart to the one-shot graph operators
(connected components in operators/dedup.py / components.py): a fixed
number of power-iteration rounds over an edge list, every quantity an
integer, so the whole computation — including the damping split and
dangling-mass redistribution — replays bit-identically in a DuckDB
oracle of unrolled CTEs. Reference scope note: the reference
(`500px/kinesis-stream`) ships no graph processing; north-star
extension surface, same as the components family.

Fixed-point semantics (PR_SCALE = 2^40, damping d = 17/20 = 0.85):

    r⁰(v)   = PR_SCALE div N
    c(u→v)  = (17 · r(u)) div (20 · outdeg(u))       per edge
    D       = (17 · Σ_{dangling u} r(u)) div (20 · N) per round
    T       = (3 · PR_SCALE) div (20 · N)             per round
    r'(v)   = T + D + Σ_{u→v} c(u→v)

Integer floor division loses a few units of mass per round (bounded by
edges + N per round at 2^-40 granularity) — the deterministic price of
exactness; ranks stay ordered identically to float PageRank far beyond
any real ranking gap. Headroom: total mass ≈ PR_SCALE, so every
per-node sum is ≤ ~2^40 regardless of graph size — BIGINT-safe at any
N (contributions CONSERVE mass; no N-proportional blowup anywhere).

Scale shape (100 TB): the edge list is the only large input,
checkpointed once (at deployment scale a durable checkpoint dir, as
everywhere in the repo); each round is one broadcast-joined map over
edges (rank and checkpointed outdeg joins on src) plus a dst-keyed
sum. N and the per-round dangling sum ride as broadcast 1-row frames —
NO driver collect anywhere. Rounds checkpoint eagerly and superseded
blocks are released as the loop advances (see :func:`pagerank`).
Rounds are a fixed constant: power iteration converges geometrically
(damping 0.85 → ~5 rounds for ranking stability), so the job count is
bounded and known.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_stream_spark.operators.dedup import _release_local_checkpoint

PR_SCALE = 1 << 40


def _pagerank_round(
    e: DataFrame,
    nodes: DataFrame,
    outdeg: DataFrame,
    nn: DataFrame,
    r: DataFrame,
) -> DataFrame:
    """One power-iteration round (module docstring for the integer
    semantics) — factored out so plan tests can pin the round SHAPE
    (broadcast scalars, hash joins, no cartesian) directly: inside
    :func:`pagerank` every round's output is an eager checkpoint, which
    truncates the explainable plan."""
    contribs = (
        e.join(r.select(F.col("v").alias("src"), "r"), "src")
        .join(outdeg.select(F.col("v").alias("src"), "deg"), "src")
        .select("dst", F.expr("(17 * r) div (20 * deg)").alias("c"))
        .groupBy(F.col("dst").alias("v"))
        .agg(F.sum("c").alias("csum"))
    )
    dang = r.join(outdeg, "v", "left_anti").agg(
        F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("ds")
    )
    return (
        nodes.join(contribs, "v", "left")
        .crossJoin(F.broadcast(dang))
        .crossJoin(F.broadcast(nn))
        .select(
            "v",
            F.expr(
                f"(3 * {PR_SCALE}) div (20 * n)"
                " + (17 * ds) div (20 * n)"
                " + coalesce(csum, 0)"
            )
            .cast("long")
            .alias("r"),
        )
    )


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (module
    docstring for the exact integer semantics). Returns one row per
    node: (node, rank_fx BIGINT, rank double = rank_fx / 2^40).
    Duplicate edges collapse (simple graph); self-loops count as
    ordinary edges; nodes appearing only as destinations are dangling
    and their mass redistributes uniformly each round.

    Block-manager hygiene (the components-family discipline): rounds
    checkpoint EAGERLY and every superseded checkpoint — the previous
    round's ranks, and after the final round the edge list, node frame,
    and out-degrees — is released before return, so a completed call
    retains ONE node-sized block (the final ranks), never the
    corpus-sized edge checkpoint. The cost is that construction runs
    the computation (standard for the iterative operators here;
    connected_components does the same)."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("v"))
        .unionAll(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    nn = nodes.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # out-degrees feed two joins per round; checkpoint once instead of
    # re-aggregating the edge list up to 2x per round
    outdeg = (
        e.groupBy(F.col("src").alias("v"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint()
    )
    r = (
        nodes.crossJoin(F.broadcast(nn))
        .select("v", F.expr(f"{PR_SCALE} div n").alias("r"))
        .localCheckpoint()
    )
    for _ in range(iterations):
        prev = r
        r = _pagerank_round(e, nodes, outdeg, nn, prev).localCheckpoint()
        _release_local_checkpoint(prev)
    for frame in (e, nodes, outdeg):
        _release_local_checkpoint(frame)
    return r.select(
        F.col("v").alias("node"),
        F.col("r").alias("rank_fx"),
        (F.col("r").cast("double") / PR_SCALE).alias("rank"),
    )


def sql_pagerank(
    edges_cte: str,
    *,
    iterations: int = 3,
) -> str:
    """DuckDB oracle twin: the same integer semantics as unrolled CTEs
    over ``edges_cte → (src, dst)``. HUGEINT sums cast back to BIGINT
    each round; ordered (rank_fx desc, node) by the caller's tail."""
    ctes = [
        f"rawe AS ({edges_cte})",
        "e AS (SELECT DISTINCT src, dst FROM rawe"
        " WHERE src IS NOT NULL AND dst IS NOT NULL)",
        "nodes AS (SELECT DISTINCT v FROM"
        " (SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e))",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        "outdeg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS deg"
        " FROM e GROUP BY 1)",
        f"r0 AS (SELECT v, CAST({PR_SCALE} // n AS BIGINT) AS r"
        " FROM nodes CROSS JOIN nn)",
    ]
    for i in range(iterations):
        ctes.append(
            f"""c{i} AS (
              SELECT e.dst AS v, CAST(SUM((17 * r.r) // (20 * o.deg))
                                      AS BIGINT) AS csum
              FROM e
              JOIN r{i} r ON r.v = e.src
              JOIN outdeg o ON o.v = e.src
              GROUP BY 1
            )"""
        )
        ctes.append(
            f"""d{i} AS (
              SELECT CAST(COALESCE(SUM(r.r), 0) AS BIGINT) AS ds
              FROM r{i} r LEFT JOIN outdeg o ON o.v = r.v
              WHERE o.v IS NULL
            )"""
        )
        ctes.append(
            f"""r{i + 1} AS (
              SELECT n.v,
                     CAST((3 * {PR_SCALE}) // (20 * x.n)
                          + (17 * d.ds) // (20 * x.n)
                          + COALESCE(c.csum, 0) AS BIGINT) AS r
              FROM nodes n
              LEFT JOIN c{i} c ON c.v = n.v
              CROSS JOIN d{i} d
              CROSS JOIN nn x
            )"""
        )
    return (
        "WITH " + ", ".join(ctes)
        + f""" SELECT v AS node, r AS rank_fx,
               CAST(r AS DOUBLE) / {PR_SCALE} AS rank
               FROM r{iterations}"""
    )
