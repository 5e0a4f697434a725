"""DuckDB oracle builders for the product-quantization pipelines.

Staged for the next verification-window rotation: this module is NOT
imported by ``queries._modules()`` (nothing registers with the driver
contract yet), but the SQL it generates replays the ENTIRE PQ and
IVF-PQ pipelines — md5-seeded Lloyd training (full-dimension for the
coarse quantizer, per-subspace for the codebooks, residual-space for
IVF-PQ), fixed-point assignment with cid tie-breaks, floor-fixed-point
centroid means, encode, routing, and ADC top-k with exact BIGINT
fixed-point contribution sums — against the same ``embeddings`` view
the registered oracles use. ``tests/test_quantization.py`` runs both
against the Spark operators at sf0.001 today; round 6 promotes them to
``queries()`` entries by pasting the builders into ``@_q``
registrations.

Kept separate from ``queries/similarity.py`` deliberately: its shared
k-means CTE helpers back already-verified queries, and widening their
signatures would move verified code paths for no behavioral reason.
"""

from __future__ import annotations

from kinesis_stream_spark.functions.hashing import sql_md5_int64
from kinesis_stream_spark.functions.vectors import SCALE, _sql_fixed_sum, sql_dot
from kinesis_stream_spark.operators.similarity import CENTROID_SCALE

# derived, not duplicated: the oracle's centroid-mean fixed point must be
# the operator's (the test-time assert in test_quantization.py remains as
# a backstop against a non-float-representable future value)
_CS = repr(float(CENTROID_SCALE))


def _sql_dot_fx(a: str, b: str) -> str:
    """Raw fixed-point dot (BIGINT, pre-scale) — twin of the operator's
    ``_dot_fx``; ADC sums these exactly before one scale-back divide."""
    prods = (
        f"LIST_TRANSFORM(LIST_ZIP({a}, {b}), "
        f"z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))"
    )
    return _sql_fixed_sum(prods)


def _seed_ctes(tag: str, src: str, k: int) -> list[str]:
    """md5-seeded init shared by every Lloyd chain: the k ids with the
    smallest md5, numbered 0..k-1. Seeding hashes only ids, so chains
    over different vector spaces (full, slice, residual) share seed
    ROWS while taking their seed VECTORS from their own space."""
    md5i = sql_md5_int64("CAST(vec_id AS VARCHAR)")
    return [
        f"""seeds_{tag} AS (
          SELECT vec_id, {md5i} AS h FROM {src} ORDER BY h, vec_id LIMIT {k}
        )""",
        f"""sid_{tag} AS (
          SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS cid, vec_id
          FROM seeds_{tag}
        )""",
    ]


def _kmeans_chain(tag: str, src: str, sid: str, ndim: int, iterations: int) -> list[str]:
    """Lloyd chain replaying ``kmeans_fit`` over CTE ``{src}(vec_id, v)``
    with seed ids from ``{sid}``: same assignment metric (fixed-point
    ``2·v·c − c·c``, ties to lower cid), same floor-fixed-point means.
    Ends with ``c{iterations}_{tag}`` (final centroids)."""
    sums = ", ".join(
        f"SUM(CAST(FLOOR(CAST(v[{i + 1}] AS DOUBLE) * {_CS}) AS BIGINT)) AS s{i}"
        for i in range(ndim)
    )
    means = ", ".join(f"CAST(s{i} AS DOUBLE) / {_CS} / n" for i in range(ndim))
    score = (
        f"(2 * {sql_dot('e.v', 'c.centroid')}"
        f" - {sql_dot('c.centroid', 'c.centroid')})"
    )
    ctes = [
        f"""c0_{tag} AS (
          SELECT s.cid, e.v AS centroid FROM {sid} s JOIN {src} e USING (vec_id)
        )"""
    ]
    for it in range(iterations):
        ctes.append(
            f"""a{it}_{tag} AS (
              SELECT e.vec_id, e.v, c.cid,
                     ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                        ORDER BY {score} DESC, c.cid) AS rn
              FROM {src} e CROSS JOIN c{it}_{tag} c
            )"""
        )
        ctes.append(
            f"""m{it}_{tag} AS (
              SELECT cid, COUNT(*) AS n, {sums}
              FROM (SELECT cid, v FROM a{it}_{tag} WHERE rn = 1)
              GROUP BY cid
            )"""
        )
        ctes.append(
            f"c{it + 1}_{tag} AS (SELECT cid, [{means}] AS centroid FROM m{it}_{tag})"
        )
    return ctes


def _pq_book_and_encode_ctes(
    src: str, tag: str, m: int, subdim: int, ksub: int, iterations: int
) -> list[str]:
    """Subspace codebooks + encode over CTE ``{src}(vec_id, v)``:
    produces ``book_{tag}(sub, cid, centroid)``, ``subrows_{tag}`` and
    ``enc_{tag}(vec_id, sub, code)``."""
    ctes = list(_seed_ctes(f"{tag}s", src, ksub))
    for j in range(m):
        lo = j * subdim
        ctes.append(
            f"sl{j}_{tag} AS (SELECT vec_id, v[{lo + 1}:{lo + subdim}] AS v "
            f"FROM {src})"
        )
        ctes.extend(
            _kmeans_chain(f"{tag}{j}", f"sl{j}_{tag}", f"sid_{tag}s", subdim, iterations)
        )
    book_union = " UNION ALL ".join(
        f"SELECT {j} AS sub, cid, centroid FROM c{iterations}_{tag}{j}"
        for j in range(m)
    )
    sub_union = " UNION ALL ".join(
        f"SELECT vec_id, {j} AS sub, v AS subv FROM sl{j}_{tag}" for j in range(m)
    )
    enc_score = (
        f"(2 * {sql_dot('r.subv', 'b.centroid')}"
        f" - {sql_dot('b.centroid', 'b.centroid')})"
    )
    ctes.extend(
        [
            f"book_{tag} AS ({book_union})",
            f"subrows_{tag} AS ({sub_union})",
            f"""enc_{tag} AS (
              SELECT vec_id, sub, cid AS code FROM (
                SELECT r.vec_id, r.sub, b.cid,
                       ROW_NUMBER() OVER (PARTITION BY r.vec_id, r.sub
                                          ORDER BY {enc_score} DESC, b.cid) AS rn
                FROM subrows_{tag} r JOIN book_{tag} b USING (sub))
              WHERE rn = 1
            )""",
        ]
    )
    return ctes


def sql_pq_adc_topk(
    *,
    m: int = 2,
    ksub: int = 4,
    dim: int = 64,
    iterations: int = 2,
    n_queries: int = 3,
    k: int = 10,
    src_ctes: tuple[str, ...] = (
        "ev AS (SELECT vec_id, embedding AS v FROM embeddings)",
    ),
    src: str = "ev",
) -> str:
    """Flat-PQ oracle: train → encode → ADC top-k for the first
    ``n_queries`` vectors, output (query_id, vec_id, approx_score,
    rank) ordered by (query_id, rank). ``src_ctes``/``src`` let a
    preprocessing stage (e.g. the RR-PQ rotation in opq_sql) feed the
    same proven chain instead of copy-pasting it."""
    assert dim % m == 0
    subdim = dim // m
    ctes = list(src_ctes)
    ctes.extend(_pq_book_and_encode_ctes(src, "pq", m, subdim, ksub, iterations))
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
            f"""scored AS (
              SELECT t.qid, e.vec_id,
                     CAST(SUM(t.contrib_fx) AS DOUBLE) / {SCALE} AS approx_score
              FROM enc_pq e JOIN tbl t ON t.sub = e.sub AND t.code = e.code
              GROUP BY 1, 2
              HAVING COUNT(*) = {m}
            )""",
        ]
    )
    return f"""
    WITH {", ".join(ctes)}
    SELECT qid AS query_id, vec_id, approx_score, rank FROM (
      SELECT qid, vec_id, approx_score,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY approx_score DESC, vec_id) AS rank
      FROM scored)
    WHERE rank <= {k}
    ORDER BY query_id, rank
    """


def _ivfpq_index_ctes(
    k_coarse: int, m: int, subdim: int, ksub: int, iterations: int
) -> list[str]:
    """Shared IVF-PQ index chain: coarse train → assignment
    (``alist(vec_id, v, list_id, centroid)``) → residuals → residual
    codebook ``book_rq`` + encode ``enc_rq(vec_id, sub, code)``. Both
    the top-k and the route-census oracles replay exactly this index."""
    assign_score = (
        f"(2 * {sql_dot('e.v', 'c.centroid')}"
        f" - {sql_dot('c.centroid', 'c.centroid')})"
    )
    ctes = ["ev AS (SELECT vec_id, embedding AS v FROM embeddings)"]
    ctes.extend(_seed_ctes("cq", "ev", k_coarse))
    ctes.extend(_kmeans_chain("cq", "ev", "sid_cq", subdim * m, iterations))
    ctes.extend(
        [
            f"""alist AS (
              SELECT vec_id, v, cid AS list_id, centroid FROM (
                SELECT e.vec_id, e.v, c.cid, c.centroid,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                          ORDER BY {assign_score} DESC, c.cid) AS rn
                FROM ev e CROSS JOIN c{iterations}_cq c)
              WHERE rn = 1
            )""",
            """res AS (
              SELECT vec_id,
                     LIST_TRANSFORM(LIST_ZIP(v, centroid),
                       z -> CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) AS v
              FROM alist
            )""",
        ]
    )
    ctes.extend(_pq_book_and_encode_ctes("res", "rq", m, subdim, ksub, iterations))
    return ctes


def sql_ivfpq_topk(
    *,
    k_coarse: int = 2,
    m: int = 2,
    ksub: int = 4,
    dim: int = 64,
    iterations: int = 2,
    n_queries: int = 3,
    nprobe: int = 2,
    k: int = 10,
) -> str:
    """IVF-PQ oracle: coarse train → assign → residual PQ train →
    encode → route → compressed-domain top-k. Replays the operator's
    exact decomposition: per-(query, list) BIGINT base term
    ``2·q·c − ‖c‖²`` plus per-subspace residual contributions
    ``2·(q−c)_j·r − ‖r‖²``, summed in fixed-point, one scale-back
    divide."""
    assert dim % m == 0
    subdim = dim // m
    ctes = _ivfpq_index_ctes(k_coarse, m, subdim, ksub, iterations)
    ctes.extend(
        _ivfpq_search_ctes("", m, subdim, iterations, n_queries, nprobe, k)
    )
    return f"""
    WITH {", ".join(ctes)}
    SELECT qid AS query_id, vec_id, approx_score, rank
    FROM ranked_
    ORDER BY query_id, rank
    """


def _ivfpq_search_ctes(
    tag: str,
    m: int,
    subdim: int,
    iterations: int,
    n_queries: int,
    nprobe: int,
    k: int,
) -> list[str]:
    """Search tail over the shared index chain: route the first
    ``n_queries`` vectors to their ``nprobe`` best lists, ADC-score in
    exact fixed-point, rank. Produces ``ranked_{tag}(qid, vec_id,
    approx_score, rank)`` with rank <= k — per-``tag`` names so a sweep
    can instantiate several nprobe settings over ONE index chain."""
    route_score = (
        f"(2 * {_sql_dot_fx('q.v', 'c.centroid')}"
        f" - {_sql_dot_fx('c.centroid', 'c.centroid')})"
    )
    sub_slices = " UNION ALL ".join(
        f"SELECT qid, list_id, base_fx, {j} AS sub, "
        f"qr[{j * subdim + 1}:{j * subdim + subdim}] AS qr_sub FROM qlist_{tag}"
        for j in range(m)
    )
    return [
        f"""qlist_{tag} AS (
          SELECT qid, list_id, base_fx,
                 LIST_TRANSFORM(LIST_ZIP(qv, centroid),
                   z -> CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) AS qr
          FROM (
            SELECT q.vec_id AS qid, q.v AS qv, c.cid AS list_id,
                   c.centroid, {route_score} AS base_fx,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                      ORDER BY {route_score} DESC,
                                               c.cid) AS pr
            FROM (SELECT vec_id, v FROM ev WHERE vec_id < {n_queries}) q
            CROSS JOIN c{iterations}_cq c)
          WHERE pr <= {nprobe}
        )""",
        f"qsubs_{tag} AS ({sub_slices})",
        f"""tbl_{tag} AS (
          SELECT s.qid, s.list_id, s.sub, b.cid AS code, s.base_fx,
                 (2 * {_sql_dot_fx('s.qr_sub', 'b.centroid')}
                  - {_sql_dot_fx('b.centroid', 'b.centroid')}) AS contrib_fx
          FROM qsubs_{tag} s JOIN book_rq b USING (sub)
        )""",
        f"""scored_{tag} AS (
          SELECT t.qid, e.vec_id,
                 CAST(MIN(t.base_fx) + SUM(t.contrib_fx) AS DOUBLE)
                   / {SCALE} AS approx_score
          FROM (SELECT n.vec_id, a.list_id, n.sub, n.code
                FROM enc_rq n JOIN alist a USING (vec_id)) e
          JOIN tbl_{tag} t ON t.list_id = e.list_id AND t.sub = e.sub
                    AND t.code = e.code
          GROUP BY 1, 2
          HAVING COUNT(*) = {m}
        )""",
        f"""ranked_{tag} AS (
          SELECT qid, vec_id, approx_score, rank FROM (
            SELECT qid, vec_id, approx_score,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY approx_score DESC, vec_id) AS rank
            FROM scored_{tag})
          WHERE rank <= {k}
        )""",
    ]


def sql_pq_mse(
    *,
    m: int = 2,
    ksub: int = 4,
    dim: int = 64,
    iterations: int = 2,
) -> str:
    """Flat-PQ reconstruction-MSE oracle: train → encode → per-subspace
    squared-error sums in exact BIGINT fixed-point, one overall row
    (sub = -1) summing them, identical (double / SCALE / n) divide
    shape as the operator."""
    assert dim % m == 0
    subdim = dim // m
    ctes = ["ev AS (SELECT vec_id, embedding AS v FROM embeddings)"]
    ctes.extend(_pq_book_and_encode_ctes("ev", "pq", m, subdim, ksub, iterations))
    sqerr = (
        f"({_sql_dot_fx('r.subv', 'r.subv')}"
        f" - 2 * {_sql_dot_fx('r.subv', 'b.centroid')}"
        f" + {_sql_dot_fx('b.centroid', 'b.centroid')})"
    )
    ctes.extend(
        [
            f"""err AS (
              SELECT r.sub, {sqerr} AS sqerr_fx
              FROM subrows_pq r
              JOIN enc_pq e ON e.vec_id = r.vec_id AND e.sub = r.sub
              JOIN book_pq b ON b.sub = r.sub AND b.cid = e.code
            )""",
            """sums AS (
              SELECT sub, COUNT(*) AS n_vectors, SUM(sqerr_fx) AS sfx
              FROM err GROUP BY sub
            )""",
        ]
    )
    return f"""
    WITH {", ".join(ctes)}
    SELECT sub, n_vectors,
           CAST(sfx AS DOUBLE) / {SCALE} / n_vectors AS mse
    FROM sums
    UNION ALL
    SELECT -1 AS sub, MAX(n_vectors) AS n_vectors,
           CAST(SUM(sfx) AS DOUBLE) / {SCALE} / MAX(n_vectors) AS mse
    FROM sums
    HAVING COUNT(*) > 0  -- empty corpus: zero rows out, like the operator
    ORDER BY sub
    """


def sql_ivfpq_route_census(
    *,
    k_coarse: int = 2,
    m: int = 2,
    ksub: int = 4,
    dim: int = 64,
    iterations: int = 2,
) -> str:
    """IVF-PQ index-census oracle: replay coarse training, routing, and
    residual encoding, then count vectors per (list_id, sub, code) cell
    — a full-index parity check (every vector's list AND all M codes
    must match) without materializing per-vector rows in the output."""
    assert dim % m == 0
    subdim = dim // m
    ctes = _ivfpq_index_ctes(k_coarse, m, subdim, ksub, iterations)
    return f"""
    WITH {", ".join(ctes)}
    SELECT a.list_id, n.sub, n.code, COUNT(*) AS n_vectors
    FROM enc_rq n JOIN alist a USING (vec_id)
    GROUP BY 1, 2, 3
    ORDER BY list_id, sub, code
    """


def sql_ivfpq_rerank(
    *,
    k_coarse: int = 2,
    m: int = 2,
    ksub: int = 4,
    dim: int = 64,
    iterations: int = 2,
    n_queries: int = 3,
    nprobe: int = 2,
    r: int = 24,
    k: int = 10,
) -> str:
    """Two-stage retrieval oracle: the full IVF-PQ chain produces an
    ADC shortlist of ``r`` candidates per query (``ranked_`` with
    ``k = r``), then ONLY those rows are re-scored exactly against the
    full-precision corpus — ``2·q·v − ‖v‖²`` with the same BIGINT
    fixed-point sums the Spark ``exact_rerank`` uses — and re-ranked to
    the final ``k``. Ties (two candidates collapsing to one exact
    double) break to the lower vec_id on both engines."""
    assert dim % m == 0
    subdim = dim // m
    ctes = _ivfpq_index_ctes(k_coarse, m, subdim, ksub, iterations)
    ctes.extend(
        _ivfpq_search_ctes("", m, subdim, iterations, n_queries, nprobe, r)
    )
    exact_fx = (
        f"(2 * {_sql_dot_fx('q.v', 'e.v')} - {_sql_dot_fx('e.v', 'e.v')})"
    )
    ctes.append(
        f"""rr AS (
          SELECT s.qid, s.vec_id,
                 CAST({exact_fx} AS DOUBLE) / {SCALE} AS exact_score
          FROM ranked_ s
          JOIN ev e ON e.vec_id = s.vec_id
          JOIN ev q ON q.vec_id = s.qid
        )"""
    )
    return f"""
    WITH {", ".join(ctes)}
    SELECT qid AS query_id, vec_id, exact_score, rank FROM (
      SELECT qid, vec_id, exact_score,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY exact_score DESC, vec_id) AS rank
      FROM rr)
    WHERE rank <= {k}
    ORDER BY query_id, rank
    """
