"""Mirror of the driver's t2 gate: every queries() entry with an oracle
must hash-match DuckDB on the same tables (run locally at sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from kinesis_stream_spark.queries import all_oracle_sql, all_queries
from kinesis_stream_spark.testing import compare, run_oracle

QUERIES = all_queries()
ORACLE = all_oracle_sql()


def test_every_oracle_key_has_query():
    assert set(ORACLE) <= set(QUERIES)


# Slow tier (conftest.py): the parity replays that each cost >= ~3 s
# (measured r13 durations run; together 216 s of the file's 390 s) —
# the heavy ANN/dedup/graph composites whose cost is the per-query
# training/loop constants, not the sf0.001 data. Every name here is
# covered by its dedicated operator suite AND (for the dedup/similarity
# block) heads the r13 driver window's sf0.01 verification; the default
# tier keeps the other ~250 parity params as the rotation backstop.
SLOW_PARITY = {
    "agg_hll_set_ops",
    "dedup_clusters_bigstar",
    "dedup_connected_components",
    "dedup_lsh_recall",
    "dedup_pair_distance_histogram",
    "dedup_pipeline_survivors",
    "dedup_prefix_filter_exact_pairs",
    "events_markov_stationary",
    "graph_hits_scores",
    "graph_modularity",
    "multimodal_payload_near_dup",
    "similarity_cluster_balance",
    "similarity_embedding_drift",
    "similarity_ivfpq_nprobe_sweep",
    "similarity_ivfpq_pruned_topk",
    "similarity_ivfpq_rerank",
    "similarity_ivfpq_route_census",
    "similarity_ivfpq_topk",
    "similarity_pq_adc_topk",
    "similarity_pq_reconstruction_mse",
    "similarity_rank_quality",
    "similarity_rrpq_adc_topk",
    "similarity_semantic_dedup",
    "similarity_subspace_variance",
    "similarity_topk_ivf_trained",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in SLOW_PARITY else n
        for n in sorted(ORACLE)
    ],
)
def test_parity(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    odf = run_oracle(ORACLE[name], sf_dir)
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems}"


def test_no_rows_only_registrations():
    """Since round 10 EVERY registered query carries an oracle (the
    approx sketch twins were de-registered to operator parameters);
    this pins that invariant — a new oracle-less registration would
    reintroduce `err: no_oracle` rows in the driver ledger. If a
    rows-only surface ever becomes legitimate again, restore the
    per-name canonicalizer check this assertion replaced (git log)."""
    assert sorted(set(QUERIES) - set(ORACLE)) == []
