"""Independent brute-force verification of the dedup/similarity kernels.

The DuckDB oracles REPLAY the same algorithm (same hashes, same bands),
which proves cross-engine parity but cannot catch a mistake in the
algorithm itself. These tests recompute the ground truth in plain
Python/numpy — no md5 replay, no shared code path — and check the
operators against it:

- exact dedup == dict grouping on normalized text;
- every Jaccard/containment pair the operators emit carries the exact
  set-arithmetic value Python computes, and no qualifying pair is
  missing (these operators are exact, not approximate);
- MinHash-LSH: every emitted pair's verify-Jaccard equals Python's
  exact Jaccard, and byte-identical documents are ALWAYS found
  (identical shingle sets => identical signatures => every band
  collides — a recall guarantee, not a probabilistic hope);
- cosine_pairs equals a numpy re-implementation of the fixed-point
  arithmetic, bit for bit.

Corpora are small (seeded random with a tiny vocabulary so collisions
actually occur) — the point is independence, not scale.
"""

from __future__ import annotations

import math
import random
import re

import pytest

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _corpus(seed: int, n_docs: int = 14):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(1, 12))]
        docs.append((i, "en" if i % 2 == 0 else "de", " ".join(words)))
    # force exact duplicates and a subset-containment case
    docs.append((n_docs, docs[0][1], docs[0][2]))
    docs.append((n_docs + 1, docs[1][1], docs[1][2]))
    half = docs[2][2].split()[: max(1, len(docs[2][2].split()) // 2)]
    docs.append((n_docs + 2, docs[2][1], " ".join(half)))
    return docs


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, lang string, text string")


def _token_sets(docs):
    return {i: set(t.split()) for i, _, t in docs}


def _shingle_sets(docs, n=3):
    out = {}
    for i, _, t in docs:
        toks = t.split()
        if len(toks) >= n:
            out[i] = {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}
        else:
            out[i] = {" ".join(toks)}
    return out


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_exact_dedup_matches_dict_grouping(spark, seed):
    from kinesis_stream_spark.operators.dedup import exact_dedup

    docs = _corpus(seed)
    got = {
        (r.kept_id, r.n_copies)
        for r in exact_dedup(_df(spark, docs)).collect()
    }
    groups: dict[str, list[int]] = {}
    for i, _, t in docs:
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        groups.setdefault(norm, []).append(i)
    want = {(min(ids), len(ids)) for ids in groups.values()}
    assert got == want


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_jaccard_pairs_exact_vs_python(spark, seed):
    from kinesis_stream_spark.operators.dedup import ngram_jaccard_pairs

    docs = _corpus(seed)
    toks = _token_sets(docs)
    lang = {i: g for i, g, _ in docs}
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(_df(spark, docs), ["lang"], threshold=0.3).collect()
    }
    want = {}
    ids = sorted(toks)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if lang[a] != lang[b]:
                continue
            inter = len(toks[a] & toks[b])
            if inter == 0:
                continue
            j = inter / (len(toks[a]) + len(toks[b]) - inter)
            if j >= 0.3:
                want[(a, b)] = j
    assert got == want  # same pairs AND bit-identical single-divide values


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_containment_pairs_exact_vs_python(spark, seed):
    from kinesis_stream_spark.operators.dedup import containment_pairs

    docs = _corpus(seed)
    sh = _shingle_sets(docs)
    lang = {i: g for i, g, _ in docs}
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(_df(spark, docs), ["lang"], threshold=0.5).collect()
    }
    want = {}
    ids = sorted(sh)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if lang[a] != lang[b]:
                continue
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            c = inter / min(len(sh[a]), len(sh[b]))
            if c >= 0.5:
                want[(a, b)] = c
    assert got == want


@pytest.mark.parametrize("seed", [7, 42])
def test_minhash_verify_values_and_exact_copy_recall(spark, seed):
    from kinesis_stream_spark.operators.dedup import near_duplicates_minhash

    docs = _corpus(seed)
    sh = _shingle_sets(docs)
    rows = near_duplicates_minhash(_df(spark, docs), threshold=0.0).collect()
    for r in rows:
        inter = len(sh[r.id_a] & sh[r.id_b])
        union = len(sh[r.id_a] | sh[r.id_b])
        assert r.jaccard == inter / union, (r.id_a, r.id_b)
    # recall guarantee: identical shingle sets => identical signatures =>
    # every band collides => the pair MUST be emitted
    found = {(r.id_a, r.id_b) for r in rows}
    ids = sorted(sh)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if sh[a] == sh[b]:
                assert (a, b) in found, f"identical docs {a},{b} missed"


@pytest.mark.parametrize("seed", [7, 42])
def test_cosine_pairs_vs_numpy_fixed_point(spark, seed):
    import numpy as np

    from kinesis_stream_spark.functions.vectors import SCALE
    from kinesis_stream_spark.operators.similarity import cosine_pairs

    rng = random.Random(seed)
    dim = 8
    rows = [
        ("g%d" % (i % 2), i, [rng.uniform(-1, 1) for _ in range(dim)])
        for i in range(12)
    ]
    emb = spark.createDataFrame(rows, "label string, vec_id long, embedding array<double>")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_pairs(
            emb, group_cols=["label"], threshold=-2.0, id_col="vec_id"
        ).collect()
    }

    def fxdot(a, b):
        prods = np.array(a) * np.array(b)
        return float(np.floor(prods * SCALE).astype(np.int64).sum()) / SCALE

    def fxnorm(a):
        sq = np.array(a) * np.array(a)
        return math.sqrt(float(np.floor(sq * SCALE).astype(np.int64).sum()) / SCALE)

    by_id = {i: (g, v) for g, i, v in rows}
    for (a, b), cos in got.items():
        ga, va = by_id[a]
        gb, vb = by_id[b]
        assert ga == gb
        assert cos == fxdot(va, vb) / (fxnorm(va) * fxnorm(vb)), (a, b)
    n_per_group = {g: sum(1 for gg, _, _ in rows if gg == g) for g in ("g0", "g1")}
    assert len(got) == sum(n * (n - 1) // 2 for n in n_per_group.values())


@pytest.mark.parametrize("seed", [3, 99])
def test_salted_agg_equals_direct_agg(spark, seed):
    """The salt must be a physical-plan device only: two-phase salted
    aggregation and the direct single-shuffle group-by must agree bit
    for bit on every statistic, for any key skew."""
    from pyspark.sql import functions as F

    from kinesis_stream_spark.operators.skew import salted_agg

    rng = random.Random(seed)
    rows = [
        (i, "hot" if rng.random() < 0.8 else rng.choice("abcde"), rng.uniform(-1e4, 1e4))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "rid long, k string, v double")
    got = {
        r.k: (r.n_rows, r.sum_v, r.min_v, r.max_v)
        for r in salted_agg(df, ["k"], salt_col="rid", sum_col="v", n_salts=8).collect()
    }
    want = {
        r.k: (r.n_rows, r.sum_v, r.min_v, r.max_v)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("v").cast("decimal(27,6)")).cast("double").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }
    assert got == want and "hot" in got
