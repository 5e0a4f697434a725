"""Evaluation-operator tests: ranking quality (MRR/NDCG), the IVF-PQ
recall-vs-nprobe sweep, and embedding drift — including pure-Python
independent replays (hand-rolled float MRR/NDCG, numpy drift) that are
independent of BOTH engines, the same bar the similarity family holds.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from kinesis_stream_spark.operators.evaluation import (
    embedding_drift,
    exact_score_topk,
    ivfpq_recall_sweep,
    ranking_quality,
)

DIM = 8


def _rank_df(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, vec_id long, rank int"
    )


def _emb(spark, vecs, ids=None):
    ids = range(len(vecs)) if ids is None else ids
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(11)
    vecs = []
    for _ in range(40):
        a = rng.choice([1.0, -1.0])
        b = rng.choice([2.0, -2.0])
        v = np.concatenate(
            [
                a * np.ones(DIM // 2) + rng.uniform(-0.05, 0.05, DIM // 2),
                b * np.ones(DIM // 2) + rng.uniform(-0.05, 0.05, DIM // 2),
            ]
        )
        vecs.append(np.round(v, 3))
    return _emb(spark, vecs), vecs


def test_ranking_quality_matches_hand_computed_metrics(spark):
    """Independent replay: known truth/approx lists, float MRR/NDCG
    computed in pure Python — fixed-point tables must agree to ~1e-9."""
    k = 5
    truth = _rank_df(
        spark, [(1, t, r) for r, t in enumerate([10, 11, 12, 13, 14], 1)]
    )
    # approx hits truth items at ranks 2, 4 (items 11, 13)
    approx = _rank_df(
        spark, [(1, a, r) for r, a in enumerate([99, 11, 98, 13, 97], 1)]
    )
    out = ranking_quality(truth, approx, k=k).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_truth == 5 and r.n_hits == 2 and r.first_hit_rank == 2
    want_rr = 1.0 / 2
    dcg = 1 / math.log2(2 + 1) + 1 / math.log2(4 + 1)
    idcg = sum(1 / math.log2(i + 1) for i in range(1, 6))
    assert abs(r.rr - want_rr) < 1e-9
    assert abs(r.ndcg - dcg / idcg) < 1e-9


def test_ranking_quality_perfect_and_zero(spark):
    k = 4
    truth = _rank_df(spark, [(7, t, r) for r, t in enumerate([1, 2, 3, 4], 1)])
    perfect = ranking_quality(truth, truth, k=k).collect()[0]
    assert perfect.rr == 1.0
    # fixed-point DCG == IDCG exactly for the identical ranking
    assert perfect.ndcg == 1.0
    miss = _rank_df(spark, [(7, t, r) for r, t in enumerate([91, 92, 93, 94], 1)])
    zero = ranking_quality(truth, miss, k=k).collect()[0]
    assert zero.n_hits == 0 and zero.first_hit_rank == 0
    assert zero.rr == 0.0 and zero.ndcg == 0.0


def test_ranking_quality_short_truth_normalizes_by_available_slots(spark):
    """n_truth < k: IDCG uses min(n_truth, k) slots, so a perfect
    prefix still scores ndcg == 1.0."""
    k = 5
    truth = _rank_df(spark, [(3, 1, 1), (3, 2, 2)])
    approx = _rank_df(
        spark, [(3, a, r) for r, a in enumerate([1, 2, 50, 51, 52], 1)]
    )
    r = ranking_quality(truth, approx, k=k).collect()[0]
    assert r.n_truth == 2 and r.n_hits == 2
    assert r.ndcg == 1.0


def test_ranking_quality_partition_invariant(spark, corpus):
    emb, _ = corpus
    q = emb.where("vec_id < 3").selectExpr("vec_id AS query_id", "embedding")
    truth = exact_score_topk(emb, q, k=10)
    # a deliberately weaker "approx": cosine brute force (different metric)
    from kinesis_stream_spark.operators.similarity import topk_bruteforce

    approx = topk_bruteforce(emb, q, k=10).selectExpr(
        "query_id", "neighbor_id AS vec_id", "rank"
    )
    a = sorted(map(tuple, ranking_quality(truth, approx, k=10).collect()))
    b = sorted(
        map(
            tuple,
            ranking_quality(
                truth.repartition(7), approx.repartition(5), k=10
            ).collect(),
        )
    )
    assert a == b


def test_exact_score_topk_is_euclidean_nn_with_self_first(spark, corpus):
    emb, vecs = corpus
    q = emb.where("vec_id < 2").selectExpr("vec_id AS query_id", "embedding")
    out = exact_score_topk(emb, q, k=40).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        # self is its own Euclidean nearest neighbor
        assert rows[0].vec_id == qid
        # ranking equals argsort of exact score 2qv - vv (numpy replay)
        qv = np.array(vecs[qid])
        want = sorted(
            range(40),
            key=lambda i: (
                -(2 * np.dot(qv, np.array(vecs[i])) - np.dot(vecs[i], vecs[i])),
                i,
            ),
        )
        assert [r.vec_id for r in rows] == want


def test_ivfpq_recall_sweep_shape_and_bounds(spark, corpus):
    emb, _ = corpus
    q = emb.where("vec_id < 3").selectExpr("vec_id AS query_id", "embedding")
    out = ivfpq_recall_sweep(
        emb, q, nprobes=(1, 2), k=5, k_coarse=2, m=2, ksub=2, dim=DIM
    ).collect()
    assert [r.nprobe for r in sorted(out, key=lambda r: r.nprobe)] == [1, 2]
    for r in out:
        assert r.n_exact == 3 * 5
        assert 0 <= r.n_hits <= r.n_exact
        assert abs(r.recall - r.n_hits / r.n_exact) < 1e-12
    by_np = {r.nprobe: r.n_hits for r in out}
    # full probing sees every candidate the partial probe saw
    assert by_np[2] >= by_np[1]


def test_ivfpq_topk_sweep_matches_per_nprobe_calls(spark, corpus):
    """r12 shared-scan sweep: ivfpq_topk_sweep derives every probe
    budget from ONE routing+scoring pass; every sweep point must be
    row-identical (ids, scores, ranks) to an independent ivfpq_topk
    call at that nprobe — the exactness contract the recall sweep
    rides on."""
    from kinesis_stream_spark.operators.quantization import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_topk_sweep,
        ivfpq_train,
    )

    emb, _ = corpus
    q = emb.where("vec_id < 3").selectExpr("vec_id AS query_id", "embedding")
    coarse, book = ivfpq_train(emb, k_coarse=3, m=2, ksub=2, dim=DIM)
    index = ivfpq_encode(emb, coarse, book, m=2, dim=DIM).localCheckpoint()
    nprobes = (1, 2, 3)
    swept = ivfpq_topk_sweep(
        index, coarse, book, q, k=5, nprobes=nprobes, m=2, dim=DIM
    )
    assert sorted(swept) == list(nprobes)
    for p in nprobes:
        solo = sorted(
            map(
                tuple,
                ivfpq_topk(
                    index, coarse, book, q, k=5, nprobe=p, m=2, dim=DIM
                ).collect(),
            )
        )
        multi = sorted(map(tuple, swept[p].collect()))
        assert multi == solo, f"nprobe={p} diverged from the solo call"


def test_ivfpq_topk_sweep_empty_inputs(spark):
    """Empty corpus (no coarse centroids) and empty query batch both
    yield empty per-point frames, not errors."""
    from kinesis_stream_spark.operators.quantization import (
        ivfpq_encode,
        ivfpq_topk_sweep,
        ivfpq_train,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    empty_q = empty.withColumnRenamed("vec_id", "query_id")
    coarse, book = ivfpq_train(empty, k_coarse=2, m=2, ksub=2, dim=DIM)
    index = ivfpq_encode(empty, coarse, book, m=2, dim=DIM)
    swept = ivfpq_topk_sweep(
        index, coarse, book, empty_q, k=3, nprobes=(1, 2), m=2, dim=DIM
    )
    assert all(swept[p].count() == 0 for p in (1, 2))


def test_embedding_drift_detects_known_shift(spark):
    """Two tight clusters; snapshot B = A shifted by +delta on cluster 0
    only, with doubled share. shift_sq must reflect delta²·dim for the
    moved cluster and ~0 for the other; share deltas must match."""
    rng = np.random.default_rng(5)
    a0 = [rng.uniform(-0.01, 0.01, DIM) + 1.0 for _ in range(10)]
    a1 = [rng.uniform(-0.01, 0.01, DIM) - 1.0 for _ in range(10)]
    emb_a = _emb(spark, [np.round(v, 3) for v in a0 + a1])
    delta = 0.5
    b0 = [rng.uniform(-0.01, 0.01, DIM) + 1.0 + delta for _ in range(20)]
    b1 = [rng.uniform(-0.01, 0.01, DIM) - 1.0 for _ in range(10)]
    emb_b = _emb(spark, [np.round(v, 3) for v in b0 + b1], ids=range(100, 130))
    out = embedding_drift(emb_a, emb_b, k=2, dim=DIM, iterations=2).collect()
    assert len(out) == 2
    assert sum(r.n_a for r in out) == 20 and sum(r.n_b for r in out) == 30
    assert abs(sum(r.share_a for r in out) - 1.0) < 1e-12
    assert abs(sum(r.share_b for r in out) - 1.0) < 1e-12
    moved = max(out, key=lambda r: r.shift_sq)
    still = min(out, key=lambda r: r.shift_sq)
    assert abs(moved.shift_sq - delta * delta * DIM) < 0.1
    assert still.shift_sq < 0.01
    assert abs(moved.share_b - 2 / 3) < 0.01
    assert moved.n_a == 10 and moved.n_b == 20


def test_embedding_drift_partition_invariant(spark, corpus):
    emb, _ = corpus
    a = emb.where("vec_id % 2 = 0")
    b = emb.where("vec_id % 2 = 1")
    x = sorted(map(tuple, embedding_drift(a, b, k=2, dim=DIM).collect()))
    y = sorted(
        map(
            tuple,
            embedding_drift(a.repartition(9), b.repartition(3), k=2, dim=DIM).collect(),
        )
    )
    assert x == y


def test_evaluation_empty_inputs(spark):
    empty_rank = spark.createDataFrame([], "query_id long, vec_id long, rank int")
    assert ranking_quality(empty_rank, empty_rank, k=5).count() == 0
    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    empty_q = empty_emb.withColumnRenamed("vec_id", "query_id")
    assert exact_score_topk(empty_emb, empty_q, k=5).count() == 0


def test_evaluation_plans_no_cartesian_against_corpus(spark, corpus):
    """The only nested-loop joins are broadcast query/total sides (the
    documented topk_bruteforce shape) — never a corpus×corpus product."""
    from test_plans import _explain

    emb, _ = corpus
    q = emb.where("vec_id < 2").selectExpr("vec_id AS query_id", "embedding")
    plan = _explain(exact_score_topk(emb, q, k=5))
    assert "CartesianProduct" not in plan
    truth = exact_score_topk(emb, q, k=5)
    plan2 = _explain(ranking_quality(truth, truth, k=5))
    assert "CartesianProduct" not in plan2
    a = emb.where("vec_id % 2 = 0")
    b = emb.where("vec_id % 2 = 1")
    plan3 = _explain(embedding_drift(a, b, k=2, dim=DIM))
    assert "CartesianProduct" not in plan3
    assert "BroadcastHashJoin" in plan3 or "BroadcastNestedLoopJoin" in plan3
