"""MinHash band-agreement histogram tests — staged for round-7
registration with the RR-PQ family."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_stream_spark.operators.minhash_profile import (
    minhash_agreement_histogram,
    sql_minhash_agreement_histogram,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_copies_agree_on_every_position(spark):
    base = [
        (i, " ".join(f"w{i}t{j}" for j in range(12))) for i in range(8)
    ]
    copies = [(i + 100, t) for i, t in base]
    docs = _docs(spark, base + copies)
    hist = minhash_agreement_histogram(docs).collect()
    # identical shingle sets -> identical signatures -> agreement = 16
    full = {r.n_matching: r.n_pairs for r in hist}
    assert full.get(16, 0) >= 8
    top = max(r.n_matching for r in hist)
    assert top == 16
    for r in hist:
        assert abs(r.est_jaccard - r.n_matching / 16) < 1e-12


def test_unrelated_docs_agree_rarely_if_ever(spark):
    docs = _docs(
        spark,
        [(i, " ".join(f"u{i}x{j}" for j in range(15))) for i in range(20)],
    )
    hist = minhash_agreement_histogram(docs).collect()
    # disjoint vocabularies: any candidate is a random band collision;
    # none can agree on all positions
    assert all(r.n_matching < 16 for r in hist)


def test_histogram_counts_each_pair_once(spark):
    # a pair whose signatures fully agree collides in EVERY band; the
    # distinct in the candidate generator must count it once
    base = [(1, "a b c d e f g h"), (2, "a b c d e f g h")]
    hist = minhash_agreement_histogram(_docs(spark, base)).collect()
    assert len(hist) == 1
    assert hist[0].n_matching == 16 and hist[0].n_pairs == 1


def test_cross_engine_parity_on_documents_with_copies(spark, sf_dir):
    """Round-7 promotion test running early: the full histogram
    string-compares against the DuckDB replay on documents ∪ copies."""
    import duckdb

    from kinesis_stream_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    both = docs.unionAll(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    got = [
        (r.n_matching, r.n_pairs, repr(r.est_jaccard))
        for r in minhash_agreement_histogram(both).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    cte = (
        "SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents"
    )
    want = [
        (r[0], r[1], repr(float(r[2])))
        for r in con.execute(sql_minhash_agreement_histogram(cte)).fetchall()
    ]
    con.close()
    assert got  # copies guarantee non-vacuous candidates
    assert got == want


def test_empty_corpus_empty_histogram(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert minhash_agreement_histogram(empty).count() == 0
