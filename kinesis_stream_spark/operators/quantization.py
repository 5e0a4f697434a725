"""Product quantization (PQ) for embedding compression + ADC search.

Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011): split each D-dim vector into M orthogonal
subvectors, k-means each subspace independently (ksub centroids), and
store a vector as M small centroid ids — D·4 bytes become M bytes at
ksub ≤ 256. Search runs in the compressed domain via asymmetric
distance computation (ADC): the query stays full-precision, each
(subspace, centroid) contribution is precomputed once per query, and a
database vector's score is M table lookups summed.

Spark-first shapes, same determinism discipline as the rest of the
repo (everything replayable by a DuckDB oracle when this graduates to
the query inventory):

- **train**: M independent :func:`~kinesis_stream_spark.operators.
  similarity.kmeans_fit` runs, one per subspace slice — md5-derived
  seeding, exact fixed-point dots, floor-fixed-point centroid means.
  M is a small constant, so the per-subspace loop unrolls at plan
  time; nothing iterates over data on the driver.
- **encode**: explode each vector into its M subvectors (M rows per
  vector), broadcast the (M·ksub)-row codebook, per-(vector, subspace)
  argmax window, fold the winning ids back into one ``array<int>``.
  Map-side cost only — the corpus shuffles once, at M-rows-per-vector
  width, carrying subvectors of D/M floats.
- **ADC top-k**: the per-query lookup table (Q·M·ksub rows — queries
  are few by contract, same as brute-force) broadcasts; exploded codes
  equi-join it on (subspace, code), and the per-(query, vector) sum is
  a map-side-combinable aggregate followed by a per-query top-k
  window. The full-precision corpus is never touched at search time —
  that is the point of PQ.

The ADC score convention matches the IVF/k-means training metric
(argmax of ``2·v·c − c·c``): summed over subspaces it equals
``2·q·v̂ − ‖v̂‖²`` for the reconstruction ``v̂`` exactly, because
subspaces occupy disjoint coordinate slots — so ADC ranking is EXACT
scoring of reconstructed vectors, and quantization error is the only
approximation (pinned by a numpy-replay test).

Bench note (round-10 adjudication of the round-9 ivfpq drift,
setjoin-precedent dual-context measurement, sf0.1 local[32] idle
host, min-of-3): the family's cost is ORDER-SENSITIVE because the
first family member run in a session absorbs ~4–6 s of shared warmup
(training-chain codegen + embeddings reader init) that the lineitem
noop warm-up does not cover. Solo sweep with ivfpq_topk first:
topk 17.0 / census 13.7 / rerank 13.4 / pruned 14.7 / sweep 15.2 s;
the SAME binaries with the order reversed: sweep 19.2 / pruned 19.5 /
rerank 13.9 / census 11.1 / topk 12.7 s — topk at 12.7 s matches its
r8 full-suite number exactly. Conclusion: the r8→r9 "+17%/+22%" on
topk/census was measurement context (29% more co-resident queries +
alphabetical ordering placing different family members first), not a
plan change; the family's code and explain output are untouched since
r8 except the +91-line pruned variant.

Round-12 adjudication of the round-11 `pruned_topk` drift (14.96 →
25.81 s in the r11 suite run, the one mover above the calibrated 1.5×
band): solo fresh-process min-of-3 with gc between reps (all-table
warm-up, sf0.1 local[32] idle host) measured reps 24.57 / 14.55 /
15.40 — min 14.55 s, matching the r10 full-suite 14.96 s on code and
plan untouched since r8. Rep 1's 24.6 s shows the ~10 s family
warm-up landing on the first member even solo; in r11's sorted suite
order `pruned_topk` ran after `nprobe_sweep` had already absorbed it,
so the +10.8 s there was session-context (predecessor checkpoint /
broadcast residue), not code. Verdict: NO regression — steady-state
cost is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kinesis_stream_spark.functions.vectors import SCALE, _fixed_sum, dot_decimal


def _dot_fx(a: Column, b: Column) -> Column:
    """Raw fixed-point dot product (BIGINT, pre-scale): the ADC
    aggregation sums these exactly — summing the per-subspace DOUBLE
    contributions instead would be partition-order-sensitive."""
    return _fixed_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def _subvector(vec: Column, sub: int, subdim: int) -> Column:
    """Slice subspace ``sub`` (0-based) out of a flat embedding array —
    1-based ``slice``, pure JVM, no explode."""
    return F.slice(vec, sub * subdim + 1, subdim)


def pq_train(
    emb: DataFrame,
    *,
    m: int = 4,
    ksub: int = 4,
    dim: int = 64,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train the PQ codebook: (sub, cid, n_members, centroid) with one
    deterministic Lloyd run per subspace. At 100 TB train on a hash
    sample (``stratified_sample``) exactly as the IVF runbook
    prescribes — the codebook is M·ksub rows regardless of corpus
    size."""
    from kinesis_stream_spark.operators.similarity import kmeans_fit

    assert dim % m == 0, "dim must split evenly into m subspaces"
    subdim = dim // m
    books = []
    for j in range(m):
        sub_emb = emb.select(
            F.col(id_col), _subvector(F.col(vec_col), j, subdim).alias(vec_col)
        )
        books.append(
            kmeans_fit(
                sub_emb,
                k=ksub,
                dim=subdim,
                iterations=iterations,
                id_col=id_col,
                vec_col=vec_col,
            ).select(F.lit(j).alias("sub"), "cid", "n_members", "centroid")
        )
    out = books[0]
    for b in books[1:]:
        out = out.unionAll(b)
    # The codebook is a broadcast-sized training artifact consumed by
    # several downstream plans (encode, ADC tables, MSE) — materialize it
    # once (M·ksub rows) so consumers don't each re-embed M Lloyd chains
    # in their analyzed plan. Without this cut the composed IVF-PQ plan
    # (whose residuals already carry the coarse chain) grows
    # multiplicatively and can OOM the driver-side analyzer. A real
    # deployment writes the codebook to a table here.
    return out.localCheckpoint()


def _exploded_subvectors(
    corpus: DataFrame,
    m: int,
    subdim: int,
    id_col: str,
    vec_col: str,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(vid, *passthrough, sub, subv): M rows per vector, built with one
    explode over a plan-time array of slices. ``passthrough`` columns
    ride along unchanged — the single place the subspace-slicing
    convention lives (an OPQ-style rotation would change only this)."""
    subs = F.array(
        *[
            F.struct(
                F.lit(j).alias("sub"),
                _subvector(F.col(vec_col), j, subdim).alias("subv"),
            )
            for j in range(m)
        ]
    )
    return corpus.select(
        F.col(id_col).alias("vid"), *passthrough, F.explode(subs).alias("s")
    ).select("vid", *passthrough, "s.sub", "s.subv")


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    *,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Encode every vector as its M nearest sub-centroid ids:
    (vid, *passthrough, codes array<int>). Assignment metric is the
    training metric (argmax ``2·v·c − c·c``, exact fixed-point dots,
    ties to the lower cid) so encode(train-set) reproduces the final
    training assignment. ``passthrough`` columns (constant per vid,
    e.g. an IVF list id) ride the existing explode + aggregation — no
    second corpus-sized join to re-attach them."""
    assert dim % m == 0
    subdim = dim // m
    sub_rows = _exploded_subvectors(
        corpus, m, subdim, id_col, vec_col, passthrough
    )
    score = (
        2 * dot_decimal(F.col("subv"), F.col("centroid"))
        - dot_decimal(F.col("centroid"), F.col("centroid"))
    ).alias("score")
    # Argmax via max_by over (score, -cid) — identical winner to a
    # row_number window: score is a DOUBLE derived from exact fixed-
    # point sums, so both engines compute the identical double, and
    # when two centroids' scores collapse to one double the -cid struct
    # field breaks the tie to the lower cid exactly as the window's
    # ORDER BY did. Map-side combinable where the window was not: the
    # shuffle
    # carries one partial max per (vid, sub) per map partition instead
    # of every scored candidate row into a sort. At 100 TB encode this
    # is the difference between shuffling N·M·ksub rows and N·M.
    assigned = (
        sub_rows.join(F.broadcast(codebook.select("sub", "cid", "centroid")), "sub")
        .select("vid", *passthrough, "sub", "cid", score)
        .groupBy("vid", *passthrough, "sub")
        .agg(
            F.max_by(
                "cid", F.struct(F.col("score"), (-F.col("cid")).alias("nc"))
            ).alias("cid")
        )
    )
    # array_sort on (sub, cid) structs orders by subspace, then project
    # the ids — deterministic fold, no assumption on collect_list order
    return assigned.groupBy("vid", *passthrough).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "cid"))),
            lambda s: s.getField("cid").cast("int"),
        ).alias("codes")
    )


def pq_topk_adc(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    m: int = 4,
    dim: int = 64,
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Compressed-domain top-k via ADC: (query_id, vec_id, approx_score,
    rank). ``codes`` is :func:`pq_encode` output; the full-precision
    corpus is never read. The per-query table (Q·M·ksub rows) is the
    broadcast side; exploded codes equi-join it on (sub, code) and the
    per-pair sum combines map-side before the single (query, vector)
    shuffle.

    Contract: ``codes`` must be :func:`pq_encode` output for THIS
    ``codebook`` and ``m``. Rows with the wrong code arity are filtered
    at the scan edge; a codes/codebook VERSION mismatch (a code id the
    table lacks) surfaces as that candidate silently missing from the
    ranking (the ``_n == m`` guard below), not as an error — detect it
    with :func:`pq_reconstruction_mse` or an input-vs-output count
    check before trusting a re-encoded index."""
    assert dim % m == 0
    subdim = dim // m
    q_subs = _exploded_subvectors(
        queries, m, subdim, query_id_col, query_vec_col
    ).select(F.col("vid").alias("qid"), "sub", "subv")
    # contributions stay in the BIGINT fixed-point domain until after
    # the sum: exact, order-independent, one scale-back IEEE divide
    table = q_subs.join(codebook.select("sub", "cid", "centroid"), "sub").select(
        "qid",
        "sub",
        F.col("cid").alias("code"),
        (
            2 * _dot_fx(F.col("subv"), F.col("centroid"))
            - _dot_fx(F.col("centroid"), F.col("centroid"))
        ).alias("contrib_fx"),
    )
    code_rows = codes.where(F.size("codes") == m).select(
        "vid",
        F.posexplode("codes").alias("sub", "code"),
    )
    scored = (
        code_rows.join(F.broadcast(table), ["sub", "code"])
        .groupBy("qid", "vid")
        .agg(
            F.sum("contrib_fx").alias("_sfx"),
            F.count(F.lit(1)).alias("_n"),
        )
        # a vector scores against a query only with ALL M contributions
        # (a missing (sub, code) table row would silently under-score)
        .where(F.col("_n") == m)
        .select(
            "qid",
            "vid",
            (F.col("_sfx").cast("double") / SCALE).alias("approx_score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("approx_score"), F.asc("vid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("vid").alias("vec_id"),
            "approx_score",
            "rank",
        )
    )


def pq_reconstruction_mse(
    corpus: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    *,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Codebook quality diagnostic: per-subspace and overall mean squared
    reconstruction error — the number that decides whether ksub/m are
    adequate before anything is re-encoded at scale. Output is M
    per-subspace rows plus one overall row with ``sub = -1`` (full-vector
    MSE: subspaces occupy disjoint slots, so it is exactly the sum of the
    per-subspace error sums over the same vector count). One exploded
    join of (vid, sub, subv) against assigned sub-centroids; per-term
    squared error stays in the BIGINT fixed-point domain (``‖a−c‖²·2^40
    = fx(a,a) − 2·fx(a,c) + fx(c,c)``) through an exact integer sum,
    then two IEEE divides per output row. NOT davg's DECIMAL(27,6) path:
    that cast rounds HALF_UP on a 1e-6 tie (engine-divergent, see
    queries/_util.py) and would quantize an MSE of ~1e-8 — real for a
    good codebook — to 0.0."""
    assert dim % m == 0
    subdim = dim // m
    sub_rows = _exploded_subvectors(corpus, m, subdim, id_col, vec_col)
    assigned = sub_rows.join(
        codes.select("vid", F.posexplode("codes").alias("sub", "cid")),
        ["vid", "sub"],
    ).join(F.broadcast(codebook.select("sub", "cid", "centroid")), ["sub", "cid"])
    sqerr_fx = (
        _dot_fx(F.col("subv"), F.col("subv"))
        - 2 * _dot_fx(F.col("subv"), F.col("centroid"))
        + _dot_fx(F.col("centroid"), F.col("centroid"))
    ).alias("sqerr_fx")
    mse = (F.col("_sfx").cast("double") / SCALE / F.col("n_vectors")).alias("mse")
    sums = assigned.select("sub", sqerr_fx).groupBy("sub").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("sqerr_fx").alias("_sfx"),
    )
    per_sub = sums.select("sub", "n_vectors", mse)
    # encode emits exactly one code per (vid, sub), so every subspace row
    # count equals the vector count; the M-row re-agg is free
    overall = (
        sums.agg(
            F.max("n_vectors").alias("n_vectors"), F.sum("_sfx").alias("_sfx")
        )
        # a global agg over an empty frame emits one all-NULL row; the
        # empty-input contract is zero rows out
        .where(F.col("n_vectors").isNotNull())
        .select(F.lit(-1).alias("sub"), "n_vectors", mse)
    )
    return overall.unionAll(per_sub).orderBy("sub")


# --- IVF-PQ: coarse routing + residual product quantization -------------------


def _residual(v: Column, c: Column) -> Column:
    """Element-wise v − c (single IEEE subtract per element — identical
    on both engines)."""
    return F.zip_with(v, c, lambda x, y: x.cast("double") - y.cast("double"))


def ivfpq_train(
    emb: DataFrame,
    *,
    k_coarse: int = 4,
    m: int = 4,
    ksub: int = 4,
    dim: int = 64,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train the IVF-PQ index (the standard FAISS IVFPQ architecture):
    a coarse k-means quantizer routes vectors to inverted lists, and a
    PQ codebook trained on RESIDUALS (v − coarse centroid) encodes the
    within-list offset — residual encoding concentrates the signal the
    subquantizers see, which is why IVFPQ beats flat PQ at equal bytes.

    Returns (coarse, book): the k_coarse-row centroid frame and the
    (m·ksub)-row residual codebook. Both are broadcast-sized regardless
    of corpus size; at 100 TB train on a sample, exactly as the IVF
    runbook prescribes."""
    from kinesis_stream_spark.operators.similarity import (
        assign_to_centroids,
        kmeans_fit,
    )

    coarse = (
        kmeans_fit(
            emb, k=k_coarse, dim=dim, iterations=iterations,
            id_col=id_col, vec_col=vec_col,
        )
        .select("cid", "centroid")
        # k_coarse rows; same lineage cut as the codebook above — the
        # residual frame (and through it all M subspace Lloyd chains,
        # the encode, and the search) would otherwise each replay the
        # coarse training plan inside their own
        .localCheckpoint()
    )
    assigned = assign_to_centroids(
        emb, coarse, id_col=id_col, vec_col=vec_col
    ).join(F.broadcast(coarse), "cid")
    residuals = assigned.select(
        F.col("vid").alias(id_col),
        _residual(F.col("v"), F.col("centroid")).alias(vec_col),
    )
    book = pq_train(
        residuals, m=m, ksub=ksub, dim=dim, iterations=iterations,
        id_col=id_col, vec_col=vec_col,
    ).select("sub", "cid", "centroid")
    return coarse, book


def ivfpq_encode(
    corpus: DataFrame,
    coarse: DataFrame,
    book: DataFrame,
    *,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Index the corpus: (vid, list_id, codes). One coarse assignment
    (broadcast + argmax window), one residual map, one PQ encode — the
    full-precision vector is read once and never stored."""
    from kinesis_stream_spark.operators.similarity import assign_to_centroids

    assigned = assign_to_centroids(
        corpus, coarse, id_col=id_col, vec_col=vec_col
    ).join(F.broadcast(coarse), "cid")
    residuals = assigned.select(
        F.col("vid"),
        F.col("cid").alias("list_id"),
        _residual(F.col("v"), F.col("centroid")).alias("r"),
    )
    # list_id rides pq_encode's own explode + aggregation — re-attaching
    # it afterwards would cost a second corpus-sized shuffle join
    return pq_encode(
        residuals, book, m=m, dim=dim, id_col="vid", vec_col="r",
        passthrough=("list_id",),
    ).select("vid", "list_id", "codes")


def ivfpq_topk(
    index: DataFrame,
    coarse: DataFrame,
    book: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 2,
    m: int = 4,
    dim: int = 64,
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ search: route each query to its ``nprobe`` best lists,
    then ADC-score ONLY vectors in probed lists, in the compressed
    domain. With v̂ = c_list + v̂r the exact reconstruction score
    ``2·q·v̂ − ‖v̂‖²`` decomposes into a per-(query, list) base term
    ``2·q·c − ‖c‖²`` plus per-subspace contributions
    ``2·(q−c)_j·r − ‖r‖²`` — every piece precomputable per
    (query, list, subspace, code), so the lookup table
    (Q·nprobe·M·ksub rows) broadcasts and a candidate's score is M
    lookups + one add, all in exact BIGINT fixed-point until the final
    scale-back divide. List pruning is the scale lever: only
    nprobe/k_coarse of the corpus is touched per query, and a corpus
    PARTITIONED BY list_id turns that into partition pruning.
    """
    assert dim % m == 0
    subdim = dim // m
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
    )
    qlist = _route_queries(q, coarse, nprobe=nprobe)
    return _adc_topk(
        index, qlist, book, k=k, m=m, subdim=subdim,
        query_id_col=query_id_col,
    )


def _route_queries(q, coarse: DataFrame, *, nprobe: int) -> DataFrame:
    """Route each (qid, qv) query to its ``nprobe`` best inverted
    lists: (qid, list_id, base_fx, qr) with the per-(query, list)
    BIGINT base score and the query residual against the list
    centroid. Output is Q·nprobe rows — broadcast-sized by
    construction (queries are a serving batch, not a corpus)."""
    route_score = (
        2 * _dot_fx(F.col("qv"), F.col("centroid"))
        - _dot_fx(F.col("centroid"), F.col("centroid"))
    ).alias("base_fx")
    w_route = Window.partitionBy("qid").orderBy(
        F.desc("base_fx"), F.asc("list_id")
    )
    return (
        q.join(F.broadcast(coarse))
        .select("qid", "qv", F.col("cid").alias("list_id"), "centroid", route_score)
        .withColumn("pr", F.row_number().over(w_route))
        .where(F.col("pr") <= nprobe)
        .select(
            "qid",
            "list_id",
            "base_fx",
            _residual(F.col("qv"), F.col("centroid")).alias("qr"),
        )
    )


def _adc_topk(
    index: DataFrame,
    qlist: DataFrame,
    book: DataFrame,
    *,
    k: int,
    m: int,
    subdim: int,
    query_id_col: str,
) -> DataFrame:
    """ADC-score the (vid, list_id, codes) index rows against routed
    queries and keep each query's top k (the scoring half shared by
    :func:`ivfpq_topk` and :func:`ivfpq_topk_pruned`)."""
    q_subs = _exploded_subvectors(
        qlist, m, subdim, "qid", "qr", ("list_id", "base_fx")
    ).select(
        F.col("vid").alias("qid"),
        "list_id",
        "base_fx",
        "sub",
        F.col("subv").alias("qr_sub"),
    )
    table = q_subs.join(book, "sub").select(
        "qid",
        "list_id",
        "sub",
        F.col("cid").alias("code"),
        "base_fx",
        (
            2 * _dot_fx(F.col("qr_sub"), F.col("centroid"))
            - _dot_fx(F.col("centroid"), F.col("centroid"))
        ).alias("contrib_fx"),
    )
    cand = index.select(
        "vid", "list_id", F.posexplode("codes").alias("sub", "code")
    )
    scored = (
        cand.join(F.broadcast(table), ["list_id", "sub", "code"])
        .groupBy("qid", "vid", "list_id")
        .agg(
            F.sum("contrib_fx").alias("_cfx"),
            F.min("base_fx").alias("_bfx"),
            F.count(F.lit(1)).alias("_n"),
        )
        .where(F.col("_n") == m)
        .select(
            "qid",
            "vid",
            ((F.col("_bfx") + F.col("_cfx")).cast("double") / SCALE).alias(
                "approx_score"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("approx_score"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("vid").alias("vec_id"),
            "approx_score",
            "rank",
        )
    )


def write_partitioned_index(index: DataFrame, path: str) -> None:
    """Persist the (vid, list_id, codes) IVF-PQ index as parquet
    PARTITIONED BY list_id — the deployment layout the
    :func:`ivfpq_topk` docstring prescribes: one directory per
    inverted list, so nprobe routing becomes PHYSICAL partition
    pruning (the scan never opens unprobed lists' files) instead of a
    post-scan filter. k_coarse is sized so each list's partition is a
    healthy parquet file count at the target corpus (at 100 TB,
    k_coarse in the thousands keeps lists in the GB range)."""
    index.write.mode("overwrite").partitionBy("list_id").parquet(path)


def ivfpq_topk_pruned(
    spark,
    index_path: str,
    coarse: DataFrame,
    book: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 2,
    m: int = 4,
    dim: int = 64,
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ search against a :func:`write_partitioned_index` layout:
    identical routing, scoring, and results to :func:`ivfpq_topk`, but
    the corpus scan reads ONLY the probed lists' partition directories.

    The routed list ids (Q·nprobe values — bounded by the serving
    batch, never the corpus; the query vectors live on the driver in
    any ANN service, so this collect is O(requests), not O(data)) are
    planted as a literal IN predicate on the partition column, which
    Catalyst turns into ``PartitionFilters`` at the scan: unprobed
    lists contribute zero I/O, zero decode, zero rows — the physical
    realization of "only nprobe/k_coarse of the corpus is touched".
    The plan test pins the pruned scan shape; the oracle twin is
    unchanged because pruning only removes rows the broadcast-filter
    path discarded after the scan."""
    assert dim % m == 0
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
    )
    # Q·nprobe rows; checkpointed because it is consumed twice (the
    # probed-list collect and the scoring join) and its lineage holds
    # the full routing window. Left pinned: the returned frame reads it
    # lazily.
    qlist = _route_queries(q, coarse, nprobe=nprobe).localCheckpoint()
    probed = sorted(
        r.list_id for r in qlist.select("list_id").distinct().collect()
    )
    index = spark.read.parquet(index_path).where(
        F.col("list_id").isin(probed)
    )
    return _adc_topk(
        index, qlist, book, k=k, m=m, subdim=dim // m,
        query_id_col=query_id_col,
    )


def exact_rerank(
    shortlist: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Stage two of two-stage retrieval: exact re-scoring of an ADC
    shortlist against the FULL-PRECISION corpus — the standard
    deployment pattern (shortlist R ≫ k in the compressed domain, then
    R exact scores buy back most of the quantization-induced rank
    error at O(R·Q) cost instead of O(N·Q)).

    ``shortlist`` is any (query_id, vec_id) candidate frame (e.g.
    :func:`ivfpq_topk` or :func:`pq_topk_adc` run with ``k = R``).
    Scoring uses the exact metric ADC approximates — ``2·q·v − ‖v‖²``,
    monotone in L2 distance per query — with the repo's exact BIGINT
    fixed-point sums, so the oracle replays it bit-identically.

    Scale shape (pinned by plan test): the R·Q-row shortlist and the
    Q-row query frame are the BROADCAST sides; the full-precision
    corpus is scanned ONCE, filtered by the broadcast-hash semi-shape
    join down to the shortlisted rows, and never shuffled — the same
    plan ``ann_recall`` uses for its truth join. At 100 TB the corpus
    side is the only large input and it streams map-side through the
    join."""
    # distinct: a shortlist with duplicate (qid, vid) rows would score
    # the same candidate twice, each copy burning a row_number rank and
    # displacing a genuine candidate from the top-k (round-8 ADVICE fix;
    # cost is negligible at R·Q broadcast-side rows)
    sl = shortlist.select(
        F.col(query_id_col).alias("qid"), F.col(id_col).alias("vid")
    ).distinct()
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
    )
    cand = corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v")).join(
        F.broadcast(sl), "vid"
    )
    scored = cand.join(F.broadcast(q), "qid").select(
        "qid",
        "vid",
        (
            (2 * _dot_fx(F.col("qv"), F.col("v")) - _dot_fx(F.col("v"), F.col("v")))
            .cast("double")
            / SCALE
        ).alias("exact_score"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("exact_score"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("vid").alias("vec_id"),
            "exact_score",
            "rank",
        )
    )
