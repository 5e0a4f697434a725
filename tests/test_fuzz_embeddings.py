"""Fuzz-parity for the embeddings-table queries on corrupt vectors:
NULL embeddings, wrong dimensionality, NULL/NaN elements, zero-norm
rows, out-of-headroom magnitudes, and infinities. Without the validity
guard these crash (ANSI DIVIDE_BY_ZERO on a zero-norm cosine), diverge
(NaN through fixed-point floor), or wrap the BIGINT fixed-point sums
(|x| beyond VEC_MAX_ABS — the round-7 guard clause); with it, both
engines must agree exactly on the surviving computation."""

from __future__ import annotations

import os
import random

import duckdb
import pandas as pd
import pytest

# Slow tier (conftest.py): fuzz suites are opt-in regression armor
# (SPARK_GRAFT_SLOW_TESTS=1); the driver-window verify runs the
# default tier, which keeps the deterministic parity backstop.
pytestmark = pytest.mark.slow

EMB_QUERIES = [
    "similarity_topk_bruteforce",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "similarity_kmeans_fit",
    "similarity_topk_ivf_trained",
    "similarity_ann_recall",
    "similarity_ivf_nprobe_sweep",
    "similarity_semantic_dedup",
    "similarity_topk_sq8",
    "dedup_embedding_cosine_pairs",
    # balance ratios must survive corrupt rows being guarded out
    "similarity_cluster_balance",
    # round-6 PQ/IVF-PQ registrations: training, encode, routing, and
    # ADC must all agree after the guard drops the corrupt rows
    "similarity_pq_adc_topk",
    "similarity_pq_reconstruction_mse",
    "similarity_ivfpq_topk",
    "similarity_ivfpq_route_census",
    # round-6 evaluation family: metrics + drift over guarded scans
    "similarity_rank_quality",
    "similarity_ivfpq_nprobe_sweep",
    "similarity_embedding_drift",
    # late-round-6 RR-PQ registrations: rotation must compose with the
    # guard (corrupt vectors filtered before the rotate map)
    "similarity_rrpq_adc_topk",
    "similarity_subspace_variance",
    # round 12: scored by embedding[1] — NULL embeddings/elements drop
    # as NULL scores, NaN/Inf scores pin to +FX_V_CAP identically on
    # both engines (the clamp doubles as the non-finite guard), and
    # short vectors still carry a coordinate 1
    "eval_roc_auc_per_class",
]


def _corpus() -> pd.DataFrame:
    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)], i % 3) for i in range(40)
    ]
    rows.append((40, None, 0))                 # NULL embedding
    rows.append((41, [1.0] * 10, 1))           # wrong dimension
    rows.append((42, [float("nan")] * 64, 2))  # NaN elements
    rows.append((43, [0.0] * 64, 2))           # zero norm
    rows.append((44, [None] + [0.5] * 63, 0))  # NULL element
    # out-of-headroom magnitude (> VEC_MAX_ABS): would wrap the BIGINT
    # fixed-point sums engine-dependently if admitted
    rows.append((45, [300.0] + [0.5] * 63, 1))
    # infinity: passes an isnan-only guard (the pre-round-7 latent
    # hole) but fails the magnitude clause on both engines
    rows.append((46, [float("inf")] + [0.5] * 63, 2))
    return pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])


@pytest.fixture(scope="module")
def fuzz_emb_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("fuzz_emb"))
    _corpus().to_parquet(os.path.join(d, "embeddings.parquet"))
    return d


@pytest.fixture(scope="module")
def fuzz_emb_con(fuzz_emb_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{fuzz_emb_dir}/embeddings.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_fuzz_embeddings_parity(spark, fuzz_emb_dir, fuzz_emb_con, name):
    from kinesis_stream_spark.queries import all_oracle_sql, all_queries

    s = all_queries()[name](spark, fuzz_emb_dir).toPandas()
    o = fuzz_emb_con.execute(all_oracle_sql()[name]).fetchdf()
    assert sorted(s.columns) == sorted(o.columns), name
    assert len(s) == len(o), (name, len(s), len(o))
    assert len(s) > 0, (name, "guard must filter rows, not the corpus")
    cols = sorted(s.columns)
    sc = s[cols].astype(str).sort_values(cols).reset_index(drop=True)
    oc = o[cols].astype(str).sort_values(cols).reset_index(drop=True)
    bad = (sc != oc).any(axis=1)
    assert not bad.any(), (name, sc[bad].head(3), oc[bad].head(3))


def test_fuzz_pq_and_ivfpq_parity_on_guarded_corpus(spark, fuzz_emb_dir):
    """Staged PQ/IVF-PQ pipelines on the corrupt-vector corpus, guarded
    at the scan edge on BOTH engines (exactly how the round-6 query
    registration will wrap them): NULL/NaN/wrong-dim/zero-norm rows
    are filtered identically, and everything downstream — training,
    encode, routing, ADC — string-compares bit-exact."""
    import duckdb
    from pyspark.sql import functions as F

    from kinesis_stream_spark.functions.vectors import (
        sql_valid_vector,
        valid_vector,
    )
    from kinesis_stream_spark.operators.quantization import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
        pq_encode,
        pq_topk_adc,
        pq_train,
    )
    from kinesis_stream_spark.operators.quantization_sql import (
        sql_ivfpq_topk,
        sql_pq_adc_topk,
    )

    emb = (
        spark.read.parquet(f"{fuzz_emb_dir}/embeddings.parquet")
        .where(valid_vector(F.col("embedding"), 64))
        .select("vec_id", "embedding")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT vec_id, embedding FROM "
        f"read_parquet('{fuzz_emb_dir}/embeddings.parquet') "
        f"WHERE {sql_valid_vector('embedding', 64)}"
    )

    # flat PQ
    book = pq_train(emb, m=2, ksub=4, dim=64, iterations=2)
    codes = pq_encode(emb, book, m=2, dim=64)
    queries = emb.where("vec_id < 2").selectExpr("vec_id AS query_id", "embedding")
    got = [
        (r.query_id, r.vec_id, repr(r.approx_score), r.rank)
        for r in pq_topk_adc(codes, book, queries, k=6, m=2, dim=64)
        .orderBy("query_id", "rank")
        .collect()
    ]
    want = [
        (r[0], r[1], repr(float(r[2])), r[3])
        for r in con.execute(
            sql_pq_adc_topk(m=2, ksub=4, dim=64, iterations=2, n_queries=2, k=6)
        ).fetchall()
    ]
    assert got  # a both-sides-empty result would pass vacuously
    assert got == want

    # IVF-PQ
    coarse, rbook = ivfpq_train(emb, k_coarse=2, m=2, ksub=4, dim=64)
    index = ivfpq_encode(emb, coarse, rbook, m=2, dim=64)
    got2 = [
        (r.query_id, r.vec_id, repr(r.approx_score), r.rank)
        for r in ivfpq_topk(index, coarse, rbook, queries, k=6, nprobe=2, m=2, dim=64)
        .orderBy("query_id", "rank")
        .collect()
    ]
    want2 = [
        (r[0], r[1], repr(float(r[2])), r[3])
        for r in con.execute(
            sql_ivfpq_topk(
                k_coarse=2, m=2, ksub=4, dim=64, iterations=2,
                n_queries=2, nprobe=2, k=6,
            )
        ).fetchall()
    ]
    con.close()
    assert got2
    assert got2 == want2
