"""DuckDB oracle builder for the product-quantization pipeline.

Staged for the next verification-window rotation: this module is NOT
imported by ``queries._modules()`` (nothing registers with the driver
contract yet), but the SQL it generates replays the ENTIRE PQ pipeline
— md5-seeded per-subspace Lloyd training, fixed-point assignment with
cid tie-breaks, floor-fixed-point centroid means, encode, and
ADC top-k with exact BIGINT fixed-point contribution sums — against
the same ``embeddings`` view the registered oracles use.
``tests/test_quantization.py`` runs it against the Spark operators at
sf0.001 today; round 6 promotes it to a ``queries()`` entry by pasting
``sql_pq_adc_topk(...)`` into a ``@_q`` registration.

Kept separate from ``queries/similarity.py`` deliberately: its shared
k-means CTE helpers back already-verified queries, and widening their
signatures would move verified code paths for no behavioral reason.
"""

from __future__ import annotations

from kinesis_stream_spark.functions.hashing import sql_md5_int64
from kinesis_stream_spark.functions.vectors import SCALE, _sql_fixed_sum, sql_dot

# must match operators/similarity.CENTROID_SCALE (asserted in tests)
_CS = "1000000000000.0"


def _sql_dot_fx(a: str, b: str) -> str:
    """Raw fixed-point dot (BIGINT, pre-scale) — twin of the operator's
    ``_dot_fx``; ADC sums these exactly before one scale-back divide."""
    prods = (
        f"LIST_TRANSFORM(LIST_ZIP({a}, {b}), "
        f"z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))"
    )
    return _sql_fixed_sum(prods)


def _subspace_kmeans_ctes(j: int, subdim: int, ksub: int, iterations: int) -> list[str]:
    """Per-subspace replay of ``kmeans_fit`` over the slice table
    ``e{j}``: same seeds (md5 over vec_id — identical across subspaces),
    same assignment metric, same floor-fixed-point means."""
    sums = ", ".join(
        f"SUM(CAST(FLOOR(CAST(v[{i + 1}] AS DOUBLE) * {_CS}) AS BIGINT)) AS s{i}"
        for i in range(subdim)
    )
    means = ", ".join(f"CAST(s{i} AS DOUBLE) / {_CS} / n" for i in range(subdim))
    score = (
        f"(2 * {sql_dot('e.v', 'c.centroid')}"
        f" - {sql_dot('c.centroid', 'c.centroid')})"
    )
    ctes = [
        f"""c0_s{j} AS (
          SELECT s.cid, e.v AS centroid FROM sid s JOIN e{j} e USING (vec_id)
        )"""
    ]
    for it in range(iterations):
        ctes.append(
            f"""a{it}_s{j} AS (
              SELECT e.vec_id, e.v, c.cid,
                     ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                        ORDER BY {score} DESC, c.cid) AS rn
              FROM e{j} e CROSS JOIN c{it}_s{j} c
            )"""
        )
        ctes.append(
            f"""m{it}_s{j} AS (
              SELECT cid, COUNT(*) AS n, {sums}
              FROM (SELECT cid, v FROM a{it}_s{j} WHERE rn = 1)
              GROUP BY cid
            )"""
        )
        ctes.append(
            f"c{it + 1}_s{j} AS (SELECT cid, [{means}] AS centroid FROM m{it}_s{j})"
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
) -> str:
    """Full-pipeline PQ oracle: train → encode → ADC top-k for the
    first ``n_queries`` vectors, output (query_id, vec_id,
    approx_score, rank) ordered by (query_id, rank)."""
    assert dim % m == 0
    subdim = dim // m
    md5i = sql_md5_int64("CAST(vec_id AS VARCHAR)")

    ctes = [
        f"""seeds AS (
          SELECT vec_id, {md5i} AS h FROM embeddings ORDER BY h, vec_id LIMIT {ksub}
        )""",
        """sid AS (
          SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS cid, vec_id FROM seeds
        )""",
    ]
    for j in range(m):
        lo = j * subdim
        ctes.append(
            f"e{j} AS (SELECT vec_id, embedding[{lo + 1}:{lo + subdim}] AS v "
            f"FROM embeddings)"
        )
        ctes.extend(_subspace_kmeans_ctes(j, subdim, ksub, iterations))
    book_union = " UNION ALL ".join(
        f"SELECT {j} AS sub, cid, centroid FROM c{iterations}_s{j}" for j in range(m)
    )
    sub_union = " UNION ALL ".join(
        f"SELECT vec_id, {j} AS sub, v AS subv FROM e{j}" for j in range(m)
    )
    enc_score = (
        f"(2 * {sql_dot('r.subv', 'b.centroid')}"
        f" - {sql_dot('b.centroid', 'b.centroid')})"
    )
    ctes.extend(
        [
            f"book AS ({book_union})",
            f"subrows AS ({sub_union})",
            f"""enc AS (
              SELECT vec_id, sub, cid AS code FROM (
                SELECT r.vec_id, r.sub, b.cid,
                       ROW_NUMBER() OVER (PARTITION BY r.vec_id, r.sub
                                          ORDER BY {enc_score} DESC, b.cid) AS rn
                FROM subrows r JOIN book b USING (sub))
              WHERE rn = 1
            )""",
            f"""qsub AS (
              SELECT vec_id AS qid, sub, subv FROM subrows
              WHERE vec_id < {n_queries}
            )""",
            f"""tbl AS (
              SELECT q.qid, q.sub, b.cid AS code,
                     (2 * {_sql_dot_fx('q.subv', 'b.centroid')}
                      - {_sql_dot_fx('b.centroid', 'b.centroid')}) AS contrib_fx
              FROM qsub q JOIN book b USING (sub)
            )""",
            f"""scored AS (
              SELECT t.qid, e.vec_id,
                     CAST(SUM(t.contrib_fx) AS DOUBLE) / {SCALE} AS approx_score
              FROM enc e JOIN tbl t ON t.sub = e.sub AND t.code = e.code
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
