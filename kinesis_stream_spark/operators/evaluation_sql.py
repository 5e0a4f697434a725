"""DuckDB oracle builders for the evaluation/drift operators.

Twins of ``operators/evaluation.py``, composed from the quantization
oracle helpers: rank-quality metrics replay the PQ ADC ranking AND the
exact-score truth ranking, then fold the same 2^40 fixed-point
discount / reciprocal-rank lookup tables (the identical Python-computed
integer literals ``evaluation.discount_fx`` / ``evaluation.rr_fx``
inject into the Spark plan — no transcendental runs in either engine);
the IVF-PQ recall sweep replays one index chain plus one search tail
per nprobe setting; embedding drift replays Lloyd training on snapshot
A, both assignments, B's floor-fixed-point cluster means, and the exact
fixed-point shift distances.
"""

from __future__ import annotations

from kinesis_stream_spark.functions.vectors import SCALE, sql_dot
from kinesis_stream_spark.operators.evaluation import discount_fx, idcg_fx, rr_fx
from kinesis_stream_spark.operators.quantization_sql import (
    _CS,
    _ivfpq_index_ctes,
    _ivfpq_search_ctes,
    _kmeans_chain,
    _pq_book_and_encode_ctes,
    _seed_ctes,
    _sql_dot_fx,
)


def _truth_ctes(n_queries: int, k: int) -> list[str]:
    """Exact-score ground truth over CTE ``ev(vec_id, v)``: top-k by
    ``2·q·v − ‖v‖²`` (the PQ family's ranking metric), SELF INCLUDED,
    scored as the same scale-back double the Spark operator orders by
    (ordering by the raw BIGINT would split ties differently whenever
    two fixed-point scores collapse to one double)."""
    score = (
        f"CAST((2 * {_sql_dot_fx('q.v', 'e.v')}"
        f" - {_sql_dot_fx('e.v', 'e.v')}) AS DOUBLE) / {SCALE}"
    )
    return [
        f"""truth AS (
          SELECT query_id, vec_id, rank FROM (
            SELECT q.vec_id AS query_id, e.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                      ORDER BY {score} DESC, e.vec_id) AS rank
            FROM (SELECT vec_id, v FROM ev WHERE vec_id < {n_queries}) q
            CROSS JOIN ev e)
          WHERE rank <= {k}
        )"""
    ]


def _fx_list(values: tuple[int, ...]) -> str:
    """0-sentinel DuckDB list literal (index 1 = sentinel 0, index r+1 =
    values[r-1]) — twin of ``evaluation._lut``."""
    return "[" + ", ".join(["0", *[str(v) for v in values]]) + "]"


def sql_pq_rank_quality(
    *,
    m: int = 4,
    ksub: int = 4,
    dim: int = 64,
    iterations: int = 2,
    n_queries: int = 3,
    k: int = 8,
) -> str:
    """Rank-quality oracle: PQ-ADC approximate ranking vs exact-score
    truth → per-query (n_truth, n_hits, first_hit_rank, rr, ndcg).
    DCG/IDCG/RR stay in exact BIGINT fixed-point (injected literal
    tables) until one IEEE divide per output value."""
    assert dim % m == 0
    subdim = dim // m
    d_lut, rr_lut, idcg_lut = (
        _fx_list(discount_fx(k)),
        _fx_list(rr_fx(k)),
        _fx_list(idcg_fx(k)),
    )
    ctes = ["ev AS (SELECT vec_id, embedding AS v FROM embeddings)"]
    ctes.extend(_pq_book_and_encode_ctes("ev", "pq", m, subdim, ksub, iterations))
    ctes.extend(
        [
            f"""qsub AS (
              SELECT vec_id AS qid, sub, subv FROM subrows_pq
              WHERE vec_id < {n_queries}
            )""",
            f"""tbl AS (
              SELECT q.qid, q.sub, b.cid AS code,
                     (2 * {_sql_dot_fx('q.subv', 'b.centroid')}
                      - {_sql_dot_fx('b.centroid', 'b.centroid')}) AS contrib_fx
              FROM qsub q JOIN book_pq b USING (sub)
            )""",
            f"""adc AS (
              SELECT qid, vec_id, rank FROM (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY approx_score DESC,
                                                   vec_id) AS rank
                FROM (
                  SELECT t.qid, e.vec_id,
                         CAST(SUM(t.contrib_fx) AS DOUBLE) / {SCALE}
                           AS approx_score
                  FROM enc_pq e JOIN tbl t ON t.sub = e.sub AND t.code = e.code
                  GROUP BY 1, 2
                  HAVING COUNT(*) = {m}))
              WHERE rank <= {k}
            )""",
        ]
    )
    ctes.extend(_truth_ctes(n_queries, k))
    ctes.extend(
        [
            """j AS (
              SELECT a.qid, a.rank,
                     CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END AS rel
              FROM adc a LEFT JOIN truth t
                ON t.query_id = a.qid AND t.vec_id = a.vec_id
            )""",
            f"""per AS (
              SELECT qid, CAST(SUM(rel) AS BIGINT) AS n_hits,
                     COALESCE(MIN(CASE WHEN rel = 1 THEN rank END), 0)
                       AS first_hit_rank,
                     CAST(SUM(({d_lut})[rel * rank + 1]) AS BIGINT) AS dcg_fx
              FROM j GROUP BY qid
            )""",
            """tot AS (
              SELECT query_id AS qid, COUNT(*) AS n_truth
              FROM truth GROUP BY 1
            )""",
        ]
    )
    return f"""
    WITH {", ".join(ctes)}
    SELECT tot.qid AS query_id, tot.n_truth,
           COALESCE(per.n_hits, 0) AS n_hits,
           COALESCE(per.first_hit_rank, 0) AS first_hit_rank,
           CAST(({rr_lut})[COALESCE(per.first_hit_rank, 0) + 1] AS DOUBLE)
             / {float(SCALE)!r} AS rr,
           CAST(COALESCE(per.dcg_fx, 0) AS DOUBLE)
             / CAST(({idcg_lut})[LEAST(tot.n_truth, {k}) + 1] AS DOUBLE)
             AS ndcg
    FROM tot LEFT JOIN per USING (qid)
    ORDER BY query_id
    """


def sql_ivfpq_recall_sweep(
    *,
    k_coarse: int = 4,
    m: int = 4,
    ksub: int = 4,
    dim: int = 64,
    iterations: int = 2,
    n_queries: int = 3,
    nprobes: tuple[int, ...] = (1, 2, 4),
    k: int = 8,
) -> str:
    """IVF-PQ recall-vs-nprobe oracle: ONE index chain, one search tail
    per setting, micro-averaged hit counts vs exact-score truth (self
    included on both sides), one IEEE divide per row."""
    assert dim % m == 0
    subdim = dim // m
    ctes = _ivfpq_index_ctes(k_coarse, m, subdim, ksub, iterations)
    ctes.extend(_truth_ctes(n_queries, k))
    rows = []
    for nprobe in nprobes:
        tag = f"np{nprobe}"
        ctes.extend(
            _ivfpq_search_ctes(tag, m, subdim, iterations, n_queries, nprobe, k)
        )
        rows.append(
            f"""SELECT {nprobe} AS nprobe,
                  (SELECT COUNT(*) FROM ranked_{tag} r
                   JOIN truth t ON t.query_id = r.qid
                               AND t.vec_id = r.vec_id) AS n_hits,
                  (SELECT COUNT(*) FROM truth) AS n_exact"""
        )
    union = " UNION ALL ".join(rows)
    return f"""
    WITH {", ".join(ctes)}
    SELECT nprobe, n_hits, n_exact,
           CAST(n_hits AS DOUBLE) / n_exact AS recall
    FROM ({union})
    ORDER BY nprobe
    """


def sql_embedding_drift(
    *,
    k: int = 4,
    dim: int = 64,
    iterations: int = 2,
) -> str:
    """Embedding-drift oracle: Lloyd training on snapshot A (even
    vec_ids), assignment of BOTH snapshots (B = odd vec_ids), B's
    floor-fixed-point cluster means, exact fixed-point centroid→mean
    shift distances, and one IEEE divide per share."""
    assign = (
        f"(2 * {sql_dot('e.v', 'c.centroid')}"
        f" - {sql_dot('c.centroid', 'c.centroid')})"
    )
    sums = ", ".join(
        f"SUM(CAST(FLOOR(CAST(v[{i + 1}] AS DOUBLE) * {_CS}) AS BIGINT)) AS s{i}"
        for i in range(dim)
    )
    means = ", ".join(f"CAST(s{i} AS DOUBLE) / {_CS} / n" for i in range(dim))
    diff = (
        "LIST_TRANSFORM(LIST_ZIP(c.centroid, cb.mean_b), "
        "z -> CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))"
    )
    ctes = [
        "ea AS (SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id % 2 = 0)",
        "eb AS (SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id % 2 = 1)",
    ]
    ctes.extend(_seed_ctes("dr", "ea", k))
    ctes.extend(_kmeans_chain("dr", "ea", "sid_dr", dim, iterations))
    for tag, src in (("a", "ea"), ("b", "eb")):
        ctes.append(
            f"""as_{tag} AS (
              SELECT vec_id, v, cid FROM (
                SELECT e.vec_id, e.v, c.cid,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                          ORDER BY {assign} DESC, c.cid) AS rn
                FROM {src} e CROSS JOIN c{iterations}_dr c)
              WHERE rn = 1
            )"""
        )
    ctes.extend(
        [
            "ca AS (SELECT cid, COUNT(*) AS n_a FROM as_a GROUP BY cid)",
            f"""cb AS (
              SELECT cid, n AS n_b, [{means}] AS mean_b FROM (
                SELECT cid, COUNT(*) AS n, {sums} FROM as_b GROUP BY cid)
            )""",
            "ta AS (SELECT CAST(SUM(n_a) AS BIGINT) AS t_a FROM ca)",
            "tb AS (SELECT CAST(SUM(n_b) AS BIGINT) AS t_b FROM cb)",
        ]
    )
    return f"""
    WITH {", ".join(ctes)}
    SELECT c.cid,
           COALESCE(ca.n_a, 0) AS n_a,
           COALESCE(cb.n_b, 0) AS n_b,
           CAST(COALESCE(ca.n_a, 0) AS DOUBLE) / t_a AS share_a,
           CAST(COALESCE(cb.n_b, 0) AS DOUBLE) / t_b AS share_b,
           CAST(COALESCE(cb.n_b, 0) AS DOUBLE) / t_b
             - CAST(COALESCE(ca.n_a, 0) AS DOUBLE) / t_a AS share_delta,
           CAST({_sql_dot_fx(diff, diff)} AS DOUBLE) / {SCALE} AS shift_sq
    FROM c{iterations}_dr c
    LEFT JOIN ca USING (cid) LEFT JOIN cb USING (cid)
    CROSS JOIN ta CROSS JOIN tb
    ORDER BY c.cid
    """
