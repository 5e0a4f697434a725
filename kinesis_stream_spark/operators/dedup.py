"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine.

Scale design (100 TB):

- **Exact**: one shuffle on the content hash (map-side partial aggregation
  first); never a sort, never a driver collect.
- **MinHash+LSH**: signatures are pure map-side array math (no explode —
  ``transform``/``array_min`` lambdas over the shingle array); only the
  *bands* explode (``num_bands`` rows per doc, not per shingle). Candidate
  generation is an equi-join on (band_id, band_hash) — the LSH point is
  precisely that this replaces the O(n²) cross-join with a shuffle join on
  a high-selectivity key. Band buckets with a hot hash (boilerplate docs)
  skew the join: cap bucket width (``max_bucket`` guard) or salt, and let
  AQE split stragglers. Verification (exact Jaccard) runs only on candidate
  pairs.
- **SimHash**: per-token hashes aggregated into per-bit majorities — one
  explode + one groupBy(doc); near-dup blocking joins on equal 8-bit blocks
  (Hamming ≤ k ⇒ some block equal when blocks > k).
- **Embedding cosine**: pairs bounded by an equi-key (label/bucket) before
  the exact-decimal cosine (functions/vectors.py); unbounded all-pairs
  cosine is the similarity module's job (top-k, not dedup).

Everything is deterministic md5-derived hashing (functions/hashing.py), so
the DuckDB oracle replays the IDENTICAL algorithm — the parity check covers
the pipeline end-to-end, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesis_stream_spark.functions.hashing import md5_int64, shingles, tokens

DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4


def normalized_text(col: Column) -> Column:
    """Canonical form for exact dedup: casefold + whitespace collapse."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized content hash: keeps the lowest id per
    group, reports group size. One hash-shuffle; deterministic winner."""
    h = F.md5(normalized_text(F.col(text_col))).alias("content_hash")
    return (
        docs.select(F.col(id_col), h)
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("kept_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_signature(
    text: Column, *, num_hashes: int = DEFAULT_NUM_HASHES, shingle_n: int = 3
) -> Column:
    """MinHash signature as array<bigint>: sig[j] = min over shingles of
    h_j(shingle), h_j = seeded md5 hash. Map-side only."""
    sh = shingles(text, shingle_n)

    def hasher(j: int):
        # One-parameter lambda per seed: a `lambda s, j=j` default arg would
        # make pyspark treat it as a 2-arg (element, index) lambda and bind
        # the *index column* to j, silently corrupting the seed.
        return lambda s: md5_int64(s, j)

    return F.array(*[F.array_min(F.transform(sh, hasher(j))) for j in range(num_hashes)])


def lsh_band_hashes(sig: Column, *, bands: int = DEFAULT_BANDS, rows: int | None = None) -> Column:
    """Band the signature: array of (band_id, band_hash) structs. Two docs
    collide on a band iff that slice of their signatures is identical."""
    if rows is None:
        rows = DEFAULT_NUM_HASHES // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                md5_int64(
                    F.array_join(
                        F.transform(F.slice(sig, b * rows + 1, rows), lambda x: x.cast("string")),
                        ",",
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) sharing at least one LSH band."""
    sig = minhash_signature(F.col(text_col), num_hashes=num_hashes, shingle_n=shingle_n)
    banded = docs.select(
        F.col(id_col).alias("id"),
        F.explode(lsh_band_hashes(sig, bands=bands, rows=num_hashes // bands)).alias("b"),
    ).select("id", "b.band_id", "b.band_hash")
    left = banded.alias("x")
    right = banded.alias("y")
    return (
        left.join(
            right,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_hash") == F.col("y.band_hash"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def jaccard_on_shingles(
    pairs: DataFrame, docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (integer set sizes →
    one double division: engine-independent)."""
    sh = docs.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    return (
        pairs.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .select("id_a", "id_b", "jaccard")
    )


def near_duplicates_minhash(
    docs: DataFrame,
    *,
    threshold: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH bands → candidate
    join → exact-Jaccard verify ≥ threshold."""
    cands = minhash_lsh_candidates(
        docs, text_col=text_col, id_col=id_col, num_hashes=num_hashes,
        bands=bands, shingle_n=shingle_n,
    )
    return jaccard_on_shingles(
        cands, docs, text_col=text_col, id_col=id_col, shingle_n=shingle_n
    ).where(F.col("jaccard") >= threshold)


# --- SimHash -----------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc 32-bit SimHash as a '0'/'1' string (MSB first).

    Explode tokens → 60-bit md5 hash each → per-bit signed counts → sign.
    String form keeps the oracle comparison type-exact and makes the
    per-block substring join below trivial.
    """
    tok = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", md5_int64(F.col("tok")))
    bit_sums = tok.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    bit_chars = [
        F.when(F.col(f"b{i}") > 0, "1").otherwise("0")
        for i in range(SIMHASH_BITS - 1, -1, -1)  # MSB first
    ]
    return bit_sums.select(F.col("id"), F.concat(*bit_chars).alias("simhash"))


def hamming_distance(a: Column, b: Column, bits: int = SIMHASH_BITS) -> Column:
    """Hamming distance between two equal-length bit strings."""
    return F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(bits)),
            lambda i: F.substring(a, 1, bits).substr(i, F.lit(1))
            != F.substring(b, 1, bits).substr(i, F.lit(1)),
        )
    )


def near_duplicates_simhash(
    docs: DataFrame,
    *,
    max_hamming: int = 3,
    blocks: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dup: block-equality blocking (pigeonhole: hamming ≤ k
    with blocks > k ⇒ at least one of the blocks is identical), then exact
    Hamming verify. Join key is (block_id, block_bits) — same scale shape
    as MinHash-LSH banding."""
    assert blocks > max_hamming, "pigeonhole needs blocks > max_hamming"
    width = SIMHASH_BITS // blocks
    sims = simhash(docs, text_col=text_col, id_col=id_col)
    blocked = sims.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_id"),
                        F.substring("simhash", b * width + 1, width).alias("block_bits"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("blk"),
    ).select("id", "simhash", "blk.block_id", "blk.block_bits")
    x, y = blocked.alias("x"), blocked.alias("y")
    cands = (
        x.join(
            y,
            (F.col("x.block_id") == F.col("y.block_id"))
            & (F.col("x.block_bits") == F.col("y.block_bits"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.simhash").alias("sim_a"),
            F.col("y.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return cands.withColumn(
        "hamming", hamming_distance(F.col("sim_a"), F.col("sim_b"))
    ).where(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


# --- n-gram Jaccard within bounded groups -------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    group_cols: list[str],
    *,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All-pairs token-set Jaccard, bounded to pairs sharing ``group_cols``
    (the blocking key that keeps this from being a cross join at scale)."""
    base = docs.select(
        *group_cols,
        F.col(id_col).alias("id"),
        F.array_distinct(tokens(F.col(text_col))).alias("toks"),
    )
    x, y = base.alias("x"), base.alias("y")
    cond = (F.col("x.id") < F.col("y.id"))
    for c in group_cols:
        cond = cond & (F.col(f"x.{c}") == F.col(f"y.{c}"))
    return (
        x.join(y, cond)
        .select(
            *[F.col(f"x.{c}").alias(c) for c in group_cols],
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            (
                F.size(F.array_intersect("x.toks", "y.toks"))
                / F.size(F.array_union("x.toks", "y.toks"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
