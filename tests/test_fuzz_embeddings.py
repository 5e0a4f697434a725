"""Fuzz-parity for the embeddings-table queries on corrupt vectors:
NULL embeddings, wrong dimensionality, NULL/NaN elements, zero-norm
rows. Without the validity guard these crash (ANSI DIVIDE_BY_ZERO on a
zero-norm cosine) or diverge (NaN through fixed-point floor); with it,
both engines must agree exactly on the surviving computation."""

from __future__ import annotations

import os
import random

import duckdb
import pandas as pd
import pytest

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
