"""Degenerate-input robustness: every operator family must return an
empty (not crashed) result on an empty corpus — pipelines at scale hit
empty partitions, empty date slices, and empty ingest rounds routinely.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def empties(spark):
    return {
        "docs": spark.createDataFrame(
            [], "doc_id long, lang string, source string, text string"
        ),
        "emb": spark.createDataFrame(
            [], "vec_id long, label long, embedding array<double>"
        ),
        "edges": spark.createDataFrame([], "id_a long, id_b long"),
    }


def test_dedup_family_empty(spark, empties):
    from kinesis_stream_spark.operators import dedup

    docs, edges = empties["docs"], empties["edges"]
    assert dedup.exact_dedup(docs).count() == 0
    assert dedup.near_duplicates_minhash(docs).count() == 0
    assert dedup.near_duplicates_simhash(docs).count() == 0
    assert dedup.ngram_jaccard_pairs(docs, ["lang"]).count() == 0
    assert dedup.connected_components(edges).count() == 0
    assert dedup.exact_dedup_incremental(docs, dedup.seen_hashes(docs)).count() == 0


def test_similarity_family_empty(spark, empties):
    from kinesis_stream_spark.operators import similarity

    emb = empties["emb"]
    q = emb.selectExpr("vec_id AS query_id", "embedding")
    assert similarity.cosine_pairs(emb, group_cols=["label"], threshold=0.5).count() == 0
    assert similarity.topk_bruteforce(emb, q).count() == 0
    assert similarity.ann_recall(
        spark.createDataFrame([], "query_id long, neighbor_id long, rank int"),
        spark.createDataFrame([], "query_id long, neighbor_id long, rank int"),
    ).count() == 0


def test_text_family_empty(spark, empties):
    from kinesis_stream_spark.operators import text

    docs = empties["docs"]
    assert text.token_stats(docs).count() == 0
    assert text.quality_features(docs).count() == 0
    assert text.repetition_stats(docs).count() == 0
    assert text.boilerplate_fraction(docs).count() == 0
    assert text.pii_scrub(docs).count() == 0
    assert text.winnowed_fingerprints(docs).count() == 0
    assert text.pack_sequences(docs, capacity=10, partition_col="source").count() == 0
    assert text.stratified_sample(docs, {"en": 0.5}).count() == 0
    assert text.decontaminate_ngram_overlap(docs, docs).count() == 0
