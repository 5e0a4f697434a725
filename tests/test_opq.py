"""Rotated-PQ (RR-PQ) tests — staged for round-7 registration: pin the
rotation's orthonormality and metric preservation, prove the rotation
earns its keep on anisotropic data (balanced subspace variance, lower
reconstruction error), and run the full cross-engine parity the
round-7 promotion will rely on.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from kinesis_stream_spark.operators.opq import (
    rotate_embeddings,
    rotation_matrix,
    rrpq_topk_adc,
    subspace_variance,
)

DIM = 8
M = 2
KSUB = 2


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def aniso_corpus(spark):
    """Anisotropic: nearly all variance in the FIRST half of the
    coordinates — the case flat PQ handles worst (subspace 0 carries
    the signal, subspace 1 sees noise)."""
    rng = np.random.default_rng(23)
    vecs = []
    for _ in range(60):
        head = rng.choice([2.0, -2.0], size=DIM // 2) + rng.uniform(
            -0.1, 0.1, DIM // 2
        )
        tail = rng.uniform(-0.02, 0.02, DIM // 2)
        vecs.append(np.round(np.concatenate([head, tail]), 3))
    return _emb(spark, vecs), vecs


def test_rotation_matrix_is_orthonormal_and_deterministic():
    R = np.array(rotation_matrix(DIM))
    assert np.allclose(R @ R.T, np.eye(DIM), atol=1e-12)
    # deterministic across calls and seeds distinguishable
    assert rotation_matrix(DIM) == rotation_matrix(DIM)
    assert rotation_matrix(DIM, "other-seed") != rotation_matrix(DIM)


def test_rotation_preserves_norms_and_dots(spark, aniso_corpus):
    emb, vecs = aniso_corpus
    rot = {r.vec_id: np.array(r.embedding) for r in rotate_embeddings(
        emb, dim=DIM).collect()}
    R = np.array(rotation_matrix(DIM))
    for i in (0, 7, 31):
        v = np.array(vecs[i])
        # fixed-point rotation agrees with numpy R@v to quantization res
        assert np.allclose(rot[i], R @ v, atol=1e-8)
        assert abs(np.linalg.norm(rot[i]) - np.linalg.norm(v)) < 1e-7
    # inner products preserved (the property that makes ADC ranking
    # over the rotated space rank by the original metric)
    a, b = np.array(vecs[0]), np.array(vecs[7])
    assert abs(np.dot(rot[0], rot[7]) - np.dot(a, b)) < 1e-6


def test_rotation_balances_subspace_variance(spark, aniso_corpus):
    emb, _ = aniso_corpus
    before = {r.sub: r.var_share for r in subspace_variance(
        emb, m=M, dim=DIM).collect()}
    after = {r.sub: r.var_share for r in subspace_variance(
        rotate_embeddings(emb, dim=DIM), m=M, dim=DIM).collect()}
    # unrotated: subspace 0 hoards the variance; rotated: near-even
    assert before[0] > 0.95
    assert max(after.values()) < 0.75
    assert abs(sum(before.values()) - 1.0) < 1e-9
    assert abs(sum(after.values()) - 1.0) < 1e-9


def test_rrpq_beats_flat_pq_reconstruction_on_anisotropic_data(spark, aniso_corpus):
    """The reason to rotate: total reconstruction MSE (overall row) of
    PQ over rotated vectors is lower than over raw vectors when
    variance is concentrated — the idle subquantizer starts earning
    its bytes."""
    from kinesis_stream_spark.operators.quantization import (
        pq_encode,
        pq_reconstruction_mse,
        pq_train,
    )

    emb, _ = aniso_corpus

    def overall_mse(frame):
        book = pq_train(frame, m=M, ksub=KSUB, dim=DIM)
        codes = pq_encode(frame, book, m=M, dim=DIM)
        rows = pq_reconstruction_mse(frame, codes, book, m=M, dim=DIM).collect()
        return next(r.mse for r in rows if r.sub == -1)

    flat = overall_mse(emb)
    rotated = overall_mse(rotate_embeddings(emb, dim=DIM))
    assert rotated < flat


def test_rrpq_topk_scores_reconstructed_rotated_vectors(spark, aniso_corpus):
    """ADC over the rotated space still scores exact reconstructions:
    numpy replay in the rotated coordinates (same property the flat-PQ
    suite pins, inherited through composition)."""
    from kinesis_stream_spark.operators.quantization import pq_encode, pq_train

    emb, vecs = aniso_corpus
    queries = _emb(spark, vecs[:2]).withColumnRenamed("vec_id", "query_id")
    out = rrpq_topk_adc(emb, queries, k=60, m=M, ksub=KSUB, dim=DIM).collect()
    assert out

    rot_c = rotate_embeddings(emb, dim=DIM)
    book = pq_train(rot_c, m=M, ksub=KSUB, dim=DIM)
    codes = pq_encode(rot_c, book, m=M, dim=DIM)
    cents = {(r.sub, r.cid): np.array(r.centroid) for r in book.collect()}
    code_map = {r.vid: list(r.codes) for r in codes.collect()}
    R = np.array(rotation_matrix(DIM))
    for r in out[:40]:
        q = R @ np.array(vecs[r.query_id])
        v_hat = np.concatenate(
            [cents[(j, code_map[r.vec_id][j])] for j in range(M)]
        )
        exact = 2 * np.dot(q, v_hat) - np.dot(v_hat, v_hat)
        assert abs(r.approx_score - exact) < 1e-5, (r, exact)


def test_rrpq_cross_engine_parity_on_real_embeddings(spark, sf_dir):
    """Round-7 promotion test running early: rotate → train → encode →
    ADC top-k string-compares bit-exact against the DuckDB oracle on
    the real embeddings table."""
    import duckdb

    from kinesis_stream_spark.operators.opq_sql import sql_rrpq_adc_topk
    from kinesis_stream_spark.sources.batch import load_table

    M_, KSUB_, DIM_, IT_, NQ_, K_ = 2, 4, 64, 2, 3, 8
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where("vec_id < %d" % NQ_).selectExpr(
        "vec_id AS query_id", "embedding"
    )
    got = [
        (r.query_id, r.vec_id, repr(r.approx_score), r.rank)
        for r in rrpq_topk_adc(
            emb, queries, k=K_, m=M_, ksub=KSUB_, dim=DIM_, iterations=IT_
        ).orderBy("query_id", "rank").collect()
    ]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = [
        (r[0], r[1], repr(float(r[2])), r[3])
        for r in con.execute(
            sql_rrpq_adc_topk(
                m=M_, ksub=KSUB_, dim=DIM_, iterations=IT_, n_queries=NQ_, k=K_
            )
        ).fetchall()
    ]
    con.close()
    assert got
    assert got == want


def test_subspace_variance_cross_engine_parity(spark, sf_dir):
    import duckdb

    from kinesis_stream_spark.operators.opq_sql import sql_subspace_variance
    from kinesis_stream_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    for rotated in (False, True):
        frame = rotate_embeddings(emb, dim=64) if rotated else emb
        got = [
            (r.sub, repr(r.var_sum), repr(r.var_share))
            for r in subspace_variance(frame, m=4, dim=64).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')"
        )
        want = [
            (r[0], repr(float(r[1])), repr(float(r[2])))
            for r in con.execute(
                sql_subspace_variance(m=4, dim=64, rotated=rotated)
            ).fetchall()
        ]
        con.close()
        assert got == want, f"rotated={rotated}"


def test_rrpq_empty_inputs(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert rotate_embeddings(empty, dim=DIM).count() == 0
    # the n=0 stats row is filtered: zero rows, not m NaN rows
    assert subspace_variance(empty, m=M, dim=DIM).count() == 0


def test_rotation_udf_matches_catalyst_fold_bit_exactly(spark, aniso_corpus):
    """The Arrow/numpy rotation must equal the Catalyst fixed-point fold
    (_rot_coord) bit-for-bit — the executable spec the oracle also
    replays. repr-compare every coordinate."""
    from pyspark.sql import functions as F

    from kinesis_stream_spark.operators.opq import _rot_coord, rotation_matrix

    emb, _ = aniso_corpus
    R = rotation_matrix(DIM)
    fold = emb.select(
        "vec_id",
        F.array(*[_rot_coord(row, F.col("embedding")) for row in R]).alias("r"),
    )
    udf_path = rotate_embeddings(emb, dim=DIM)
    a = {r.vec_id: [repr(x) for x in r.r] for r in fold.collect()}
    b = {r.vec_id: [repr(x) for x in r.embedding] for r in udf_path.collect()}
    assert a == b


def test_rotation_udf_nulls_contract_violating_rows(spark):
    """Out-of-contract rows (NULL / wrong length / non-finite / beyond
    fixed-point headroom) rotate to NULL — never to silently wrapped
    integers from an undefined float->int64 cast."""
    rows = [
        (0, [0.5] * DIM),                     # in contract
        (1, None),                            # NULL vector
        (2, [1.0] * (DIM - 1)),               # wrong length
        (3, [float("nan")] + [0.0] * (DIM - 1)),  # non-finite
        (4, [3.0e7] + [0.0] * (DIM - 1)),     # beyond headroom
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.embedding for r in rotate_embeddings(df, dim=DIM).collect()}
    assert out[0] is not None and len(out[0]) == DIM
    for vid in (1, 2, 3, 4):
        assert out[vid] is None, vid
