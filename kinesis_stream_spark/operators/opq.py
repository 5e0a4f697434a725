"""Rotated product quantization (RR-PQ) — staged for round-7 registration.

Flat PQ splits coordinates into M contiguous subspaces; when variance
is unevenly spread across dimensions (the normal case for learned
embeddings), some subquantizers see most of the signal and others see
noise, wasting code budget. Optimized Product Quantization (Ge, He,
Ke, Sun, CVPR 2013 / TPAMI 2014) fixes this by rotating the space
before quantizing. This module implements the data-independent variant
FAISS ships as the cheap default (``RandomRotationMatrix`` /
OPQ-initialization): a fixed random ORTHONORMAL rotation spreads
variance approximately evenly across subspaces at zero training cost,
and composes with the existing PQ operators unchanged — rotation
preserves inner products and Euclidean distances, so
``pq_topk_adc`` over rotated vectors ranks by exactly the metric it
ranked before.

Learned OPQ (alternating R ↔ codebook updates via SVD) is the
deployment upgrade: its rotation is a driver-side trained artifact
(64×64 doubles) injected into the plan the same way this module's
fixed rotation is — the plumbing below IS the OPQ plumbing; only the
matrix source changes. A DuckDB oracle cannot replay an SVD, which is
why the staged, driver-checkable variant uses the deterministic
rotation.

Determinism: the matrix is generated in PURE PYTHON (md5-derived
uniforms + modified Gram-Schmidt over IEEE doubles — no numpy/LAPACK,
so no BLAS-build variance), and its entries are injected VERBATIM as
literals into both the Spark plan and the DuckDB oracle. Rotated
coordinates are computed with the same exact fixed-point dot sums as
every other vector op (functions/vectors.py), so both engines produce
bit-identical rotated vectors and everything downstream (training,
encode, ADC) inherits the proven PQ parity.
"""

from __future__ import annotations

import hashlib
import math
import struct
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesis_stream_spark.functions.vectors import _fixed_sum, SCALE


@lru_cache(maxsize=8)
def rotation_matrix(dim: int = 64, seed: str = "rrpq-v1") -> tuple[tuple[float, ...], ...]:
    """Deterministic random orthonormal ``dim × dim`` matrix (rows are
    the basis): md5-derived uniforms in [-1, 1], modified Gram-Schmidt,
    unit-normalized rows. Pure Python IEEE doubles — reproducible
    across machines and injected as identical literals into both
    engines. Orthonormal to ~1e-14 (checked in tests); determinant
    sign is irrelevant for quantization."""
    def u(i: int, j: int) -> float:
        h = hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()
        return struct.unpack(">Q", h[:8])[0] / 2.0**64 * 2.0 - 1.0

    basis: list[list[float]] = []
    for i in range(dim):
        v = [u(i, j) for j in range(dim)]
        # two MGS passes: re-orthogonalization keeps the basis clean in
        # plain double precision even for nearly-dependent draws
        for _ in range(2):
            for b in basis:
                d = sum(x * y for x, y in zip(v, b))
                v = [x - d * y for x, y in zip(v, b)]
        n = math.sqrt(sum(x * x for x in v))
        basis.append([x / n for x in v])
    return tuple(tuple(row) for row in basis)


def _rot_coord(row: tuple[float, ...], vec: Column) -> Column:
    """One rotated coordinate ``R_i · v`` with the repo's exact
    fixed-point accumulation (floor(x·r·2^40) BIGINT sums) — the
    rotated value is the same double on both engines. Kept as the
    executable specification the Pandas-UDF path below must match
    bit-for-bit on in-contract inputs (pinned by test)."""
    prods = F.zip_with(
        vec,
        F.array(*[F.lit(r) for r in row]),
        lambda x, r: x.cast("double") * r,
    )
    return _fixed_sum(prods).cast("double") / SCALE


#: fixed-point headroom bound for rotation inputs: |x| ≤ 1e4 keeps every
#: per-term |x·r·2^40| under 2^54 and the 64-term int64 sum under 2^60
#: (|r| ≤ 1 row-normalized). DEFENSIVE ONLY since the round-7 guard
#: change: ``valid_vector``/``sql_valid_vector`` now enforce the
#: strictly tighter repo-wide ``VEC_MAX_ABS`` (= 64) at the scan edge
#: on BOTH engines, so no guard-passing row can reach this branch — the
#: contract is symmetric (the DuckDB ``sql_rotate_cte`` needs no
#: mirrored NULL rule because its input is the same guarded scan).
#: Rows beyond the bound (operator called without the guard) rotate to
#: NULL rather than to silently wrapped integers.
_ROT_MAX_ABS = 1.0e4


def rotate_embeddings(
    emb: DataFrame,
    *,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "rrpq-v1",
) -> DataFrame:
    """Apply the fixed orthonormal rotation to every vector:
    (id, rotated ``vec_col``). Map-only, no shuffle.

    Implementation is an Arrow-batched Pandas UDF replaying the exact
    fixed-point semantics in numpy: per term one IEEE multiply ``x·r``,
    one IEEE multiply by 2^40, ``np.floor`` → int64, then an int64 sum
    (exact, order-free) and one scale-back divide — bit-identical to
    the Catalyst ``_rot_coord`` fold and the DuckDB twin (pinned by a
    dedicated test and the cross-engine parity suite). Chosen measured:
    the dim² higher-order-function fold runs interpreted at ~2.5 ms/row
    single-thread; the vectorized batch path is the 10-100× Arrow win
    the repo reserves for exactly this case.

    Contract: consumes PRE-VALIDATED vectors (apply ``valid_vector`` at
    the scan edge, as every embeddings query does). Rows that violate
    the contract anyway — NULL, wrong length, non-finite elements, or
    magnitudes beyond the ``_ROT_MAX_ABS`` fixed-point headroom —
    rotate to NULL (the visible outcome the Catalyst fold gave NaN
    inputs) instead of flowing an undefined float→int64 cast downstream
    as plausible-looking numbers."""
    R = rotation_matrix(dim, seed)

    @F.pandas_udf("array<double>")
    def _rot(vecs: pd.Series) -> pd.Series:
        import numpy as np

        Rm = np.asarray(R, dtype=np.float64)
        scale = float(SCALE)
        n_dim = Rm.shape[0]
        out = []
        for v in vecs:
            if v is None:
                out.append(None)
                continue
            x = np.asarray(v, dtype=np.float64)
            if (
                x.shape != (n_dim,)
                or not np.isfinite(x).all()
                or float(np.abs(x).max()) > _ROT_MAX_ABS
            ):
                out.append(None)
                continue
            prods = x[None, :] * Rm                       # (dim, dim)
            fx = np.floor(prods * scale).astype(np.int64)  # exact terms
            out.append((fx.sum(axis=1, dtype=np.int64) / scale).tolist())
        return pd.Series(out)

    return emb.select(F.col(id_col), _rot(F.col(vec_col)).alias(vec_col))


def rrpq_topk_adc(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    m: int = 4,
    ksub: int = 4,
    dim: int = 64,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: str = "rrpq-v1",
) -> DataFrame:
    """Rotated-PQ search end-to-end: rotate corpus and queries with the
    SAME matrix, then train/encode/ADC-rank with the flat-PQ operators
    unchanged. Because R is orthonormal, ``2·(Rq)·(Rv) − ‖Rv‖² =
    2·q·v − ‖q−v‖²-equivalent score`` — the ranking metric is
    preserved exactly; only the quantization cells (and therefore the
    approximation error) change. Output matches ``pq_topk_adc``:
    (query_id, vec_id, approx_score, rank)."""
    from kinesis_stream_spark.operators.quantization import (
        pq_encode,
        pq_topk_adc,
        pq_train,
    )

    # The rotated corpus feeds every Lloyd iteration of all M subspace
    # chains plus the encode — without a cut each of those ~10+ scans
    # re-runs the dim² fixed-point rotation (measured 23.5 s → 9 s at
    # sf0.1). At 100 TB this line is "write the rotated corpus once",
    # the same deployment-artifact argument as the encoded index.
    rot_c = rotate_embeddings(
        corpus, dim=dim, id_col=id_col, vec_col=vec_col, seed=seed
    ).localCheckpoint()
    rot_q = rotate_embeddings(
        queries, dim=dim, id_col=query_id_col, vec_col=vec_col, seed=seed
    )
    book = pq_train(
        rot_c, m=m, ksub=ksub, dim=dim, iterations=iterations,
        id_col=id_col, vec_col=vec_col,
    )
    codes = pq_encode(rot_c, book, m=m, dim=dim, id_col=id_col, vec_col=vec_col)
    return pq_topk_adc(
        codes, book, rot_q, k=k, m=m, dim=dim,
        query_id_col=query_id_col, query_vec_col=vec_col,
    )


@lru_cache(maxsize=8)
def _variance_sum_cols(dim: int, vec_col: str) -> tuple[tuple, tuple]:
    """Memoized (second-moment, first-moment) fixed-point sum aggregate
    Columns — unresolved name-keyed expression trees, reusable across
    plans; rebuilding the 2·dim expressions per call cost ~1 s of py4j
    round-trips per aggregate (the variance query builds two)."""
    sq = tuple(
        F.sum(
            F.floor(
                F.element_at(vec_col, i + 1).cast("double")
                * F.element_at(vec_col, i + 1).cast("double")
                * F.lit(float(SCALE))
            ).cast("decimal(38,0)")
        ).alias(f"q{i}")
        for i in range(dim)
    )
    sm = tuple(
        F.sum(
            F.floor(
                F.element_at(vec_col, i + 1).cast("double") * F.lit(float(SCALE))
            ).cast("decimal(38,0)")
        ).alias(f"s{i}")
        for i in range(dim)
    )
    return sq, sm


def subspace_variance(
    emb: DataFrame,
    *,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace variance share — the diagnostic that justifies (or
    retires) the rotation: (sub, var_sum, var_share). Flat PQ wants
    these M shares equal; a share ratio of 10:1 means one subquantizer
    carries 10× the signal of another at the same byte budget.
    Variance sums are exact fixed-point second moments minus the
    squared fixed-point means (same discipline as the centroid means:
    one identical IEEE subtract/divide per dimension, then an ordered
    left-fold over the M·(dim/M) per-dimension terms). Accumulation is
    DECIMAL(38,0) — NOT BIGINT: per-row terms reach 2^40, so a BIGINT
    sum would overflow at ~2^23 corpus rows while the decimal path
    (like _centroid_sums) has ~1e26-row headroom and matches DuckDB's
    HUGEINT sum exactly."""
    subdim = dim // m
    assert subdim * m == dim
    sq, sm = _variance_sum_cols(dim, vec_col)
    # empty corpus: the global agg emits one n=0 row whose divides
    # would NaN — the empty-input contract is zero rows out
    stats = emb.agg(F.count(F.lit(1)).alias("n"), *sq, *sm).where(F.col("n") > 0)
    # per-dim variance: E[x²] − E[x]² with exact sums, fixed op order
    var_i = [
        (
            F.col(f"q{i}").cast("double") / F.lit(float(SCALE)) / F.col("n")
            - (F.col(f"s{i}").cast("double") / F.lit(float(SCALE)) / F.col("n"))
            * (F.col(f"s{i}").cast("double") / F.lit(float(SCALE)) / F.col("n"))
        )
        for i in range(dim)
    ]
    # ordered left-fold per subspace (deterministic addition order)
    subs = []
    for j in range(m):
        acc = var_i[j * subdim]
        for i in range(j * subdim + 1, (j + 1) * subdim):
            acc = acc + var_i[i]
        subs.append(acc.alias(f"v{j}"))
    per = stats.select(*subs)
    # total = v0 + v1 + ... left-fold (the oracle mirrors this order);
    # everything derives from the ONE `per` row in a single projection —
    # no second branch re-running the corpus aggregate
    acc_t = F.col("v0")
    for j in range(1, m):
        acc_t = acc_t + F.col(f"v{j}")
    return (
        per.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("sub"),
                            F.col(f"v{j}").alias("var_sum"),
                            (F.col(f"v{j}") / acc_t).alias("var_share"),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("s")
        )
        .select("s.sub", "s.var_sum", "s.var_share")
        .orderBy("sub")
    )
