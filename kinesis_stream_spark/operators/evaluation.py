"""Retrieval-quality evaluation + embedding-drift operators.

Completes the ANN evaluation story around ``operators/similarity.py``
(recall@k, nprobe sweep) and ``operators/quantization.py`` (PQ /
IVF-PQ): ranking-quality metrics beyond recall (MRR, NDCG@k), the
recall-vs-nprobe tuning curve for the IVF-PQ index, and
between-snapshot embedding drift — the numbers that decide when a
deployed index gets re-tuned or re-trained.

Reference provenance: the reference delegates all query processing to
its host framework (SURVEY.md §2.2); these are part of the
training-data-pipeline extension surface the build brief demands.

Cross-engine float discipline (everything here is driver-oracled):
ranks and hit counts are integers; the NDCG discount table
``1/log2(rank+1)`` and the reciprocal-rank table ``1/rank`` are
precomputed ONCE in Python as 2^40 fixed-point integer literals and
injected into both engines — no transcendental function ever runs
inside either engine, so DCG/IDCG/RR sums are exact BIGINT arithmetic
with one (identical) IEEE divide per output value. Drift distances go
through the same exact fixed-point dot sums the similarity family uses.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kinesis_stream_spark.functions.vectors import SCALE
from kinesis_stream_spark.operators.quantization import _dot_fx, _residual

#: fixed-point scale for the metric lookup tables (same 2^40 the vector
#: dot products use — one shared constant keeps every scale-back divide
#: the same magnitude)
_FX = SCALE


def discount_fx(k: int) -> tuple[int, ...]:
    """NDCG discount table ``floor(2^40 / log2(rank+1))`` for ranks
    1..k. Computed by Python's libm once at plan-build time; both
    engines consume the identical integer literals."""
    return tuple(int(math.floor(_FX / math.log2(r + 1))) for r in range(1, k + 1))


def rr_fx(k: int) -> tuple[int, ...]:
    """Reciprocal-rank table ``floor(2^40 / rank)`` for ranks 1..k
    (exact integer division)."""
    return tuple(_FX // r for r in range(1, k + 1))


def idcg_fx(k: int) -> tuple[int, ...]:
    """Ideal-DCG prefix sums over :func:`discount_fx` — the IDCG for a
    truth list of n items is ``idcg_fx(k)[min(n, k) - 1]``. Defined
    HERE, next to the tables it sums, so the Spark plan and the DuckDB
    oracle provably consume the same literals."""
    out, run = [], 0
    for v in discount_fx(k):
        run += v
        out.append(run)
    return tuple(out)


def _lut(values: tuple[int, ...]) -> Column:
    """0-sentinel lookup array: index 1 is the sentinel (no hit → 0),
    index r+1 holds values[r-1]. Avoids conditional element_at under
    ANSI mode."""
    return F.array(F.lit(0).cast("long"), *[F.lit(v).cast("long") for v in values])


def ranking_quality(
    truth: DataFrame,
    approx: DataFrame,
    *,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query ranking agreement of an approximate top-k against the
    exact one: (query_id, n_truth, n_hits, first_hit_rank, rr, ndcg).

    Inputs are (query_id, id, rank) shapes from any topk_* operator;
    relevance is binary membership in the truth top-k (the standard ANN
    evaluation protocol — graded relevance would need human labels).
    ``first_hit_rank`` is 0 when no approx item is relevant (rr = 0.0).
    NDCG normalizes by the ideal DCG over ``min(n_truth, k)`` slots, so
    a perfect prefix scores 1.0 even when truth has fewer than k rows.

    Scale: both inputs are already k rows per query, so the membership
    join and per-query fold are O(k·Q) — noise next to producing the
    rankings (same shape as ann_recall). All sums are exact BIGINT
    fixed-point; one IEEE divide per output value.
    """
    d_lut, rr_lut, idcg_lut = (
        _lut(discount_fx(k)),
        _lut(rr_fx(k)),
        _lut(idcg_fx(k)),
    )

    t = truth.where(F.col("rank") <= k).select(
        F.col(query_id_col).alias("qid"), F.col(id_col).alias("item")
    )
    a = approx.where(F.col("rank") <= k).select(
        F.col(query_id_col).alias("qid"), F.col(id_col).alias("item"), "rank"
    )
    joined = a.join(
        t.withColumn("rel", F.lit(1)), ["qid", "item"], "left"
    ).select("qid", "rank", F.coalesce("rel", F.lit(0)).alias("rel"))
    per = joined.groupBy("qid").agg(
        F.sum("rel").alias("n_hits"),
        # 0-sentinel: no relevant item → rank index 0 → LUT slot 1 → 0
        F.coalesce(
            F.min(F.when(F.col("rel") == 1, F.col("rank"))), F.lit(0)
        ).alias("first_hit_rank"),
        F.sum(
            F.element_at(d_lut, (F.col("rel") * F.col("rank")).cast("int") + 1)
        ).alias("_dcg_fx"),
    )
    totals = t.groupBy("qid").agg(F.count(F.lit(1)).alias("n_truth"))
    return (
        totals.join(per, "qid", "left")
        .select(
            F.col("qid").alias(query_id_col),
            "n_truth",
            F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
            F.coalesce("first_hit_rank", F.lit(0).cast("int")).alias(
                "first_hit_rank"
            ),
            (
                F.element_at(
                    rr_lut, F.coalesce("first_hit_rank", F.lit(0)).cast("int") + 1
                ).cast("double")
                / F.lit(float(_FX))
            ).alias("rr"),
            (
                F.coalesce("_dcg_fx", F.lit(0).cast("long")).cast("double")
                / F.element_at(
                    idcg_lut, F.least(F.col("n_truth"), F.lit(k)).cast("int") + 1
                ).cast("double")
            ).alias("ndcg"),
        )
        .orderBy(query_id_col)
    )


def exact_score_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k under the PQ family's ranking metric ``2·q·v − ‖v‖²``
    (argmin Euclidean distance), SELF INCLUDED — the ground truth an ADC
    or IVF-PQ ranking approximates. Kept separate from topk_bruteforce
    (cosine, self-excluded) because recall of a quantized index must be
    measured against the metric the index optimizes. Exact BIGINT
    fixed-point scores; broadcast query side; one shuffle for the
    per-query k-selection."""
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
    )
    v = corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    scored = v.join(F.broadcast(q)).select(
        "qid",
        "vid",
        (
            (2 * _dot_fx(F.col("qv"), F.col("v")) - _dot_fx(F.col("v"), F.col("v")))
            .cast("double")
            / SCALE
        ).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("vid").alias(id_col),
            "score",
            "rank",
        )
    )


def ivfpq_recall_sweep(
    emb: DataFrame,
    queries: DataFrame,
    *,
    nprobes: tuple[int, ...] = (1, 2, 4),
    k: int = 10,
    k_coarse: int = 4,
    m: int = 4,
    ksub: int = 4,
    dim: int = 64,
    iterations: int = 2,
) -> DataFrame:
    """Recall@k of IVF-PQ search as a function of ``nprobe`` — one row
    per setting: (nprobe, n_hits, n_exact, recall), micro-averaged over
    the query batch (exact integer hit counts, ONE final IEEE divide —
    a per-query AVG of double recalls would be accumulation-order
    sensitive and engine-divergent; same discipline as
    ivf_recall_sweep).

    Truth is :func:`exact_score_topk` (the metric the index optimizes,
    self included — IVF-PQ ranks the query's own row too, so both sides
    see the same candidate universe). The index is trained and encoded
    ONCE and localCheckpointed — the artifact a deployment would have
    persisted as a table; since r12 the sweep points also share ONE
    routing + ADC-scoring pass at max(nprobe)
    (:func:`~kinesis_stream_spark.operators.quantization.ivfpq_topk_sweep`
    — bit-identical per-point results, but the index is scanned and
    scored once instead of once per sweep point)."""
    from kinesis_stream_spark.operators.quantization import (
        ivfpq_encode,
        ivfpq_topk_sweep,
        ivfpq_train,
    )

    # fail before paying for training, not after
    assert nprobes, "ivfpq_recall_sweep needs at least one nprobe setting"
    coarse, book = ivfpq_train(
        emb, k_coarse=k_coarse, m=m, ksub=ksub, dim=dim, iterations=iterations
    )
    # the encoded index and the exact truth are both sweep-invariant;
    # at test SF the checkpoints are tiny, at 100 TB these lines are
    # "read the index table / truth table you wrote" — without the cut
    # the corpus-sized exact scoring would re-execute once per sweep
    # point plus once for the totals
    index = ivfpq_encode(emb, coarse, book, m=m, dim=dim).localCheckpoint()
    exact = (
        exact_score_topk(emb, queries, k=k)
        .select(F.col("query_id"), F.col("vec_id"))
        .localCheckpoint()
    )
    totals = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    topks = ivfpq_topk_sweep(
        index, coarse, book, queries, k=k, nprobes=nprobes, m=m, dim=dim
    )
    parts = []
    for nprobe in nprobes:
        approx = topks[nprobe].select("query_id", "vec_id")
        hits = approx.join(exact, ["query_id", "vec_id"]).agg(
            F.count(F.lit(1)).alias("n_hits")
        )
        parts.append(
            hits.crossJoin(totals).select(
                F.lit(nprobe).cast("int").alias("nprobe"),
                "n_hits",
                "n_exact",
                (F.col("n_hits").cast("double") / F.col("n_exact")).alias("recall"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def embedding_drift(
    emb_a: DataFrame,
    emb_b: DataFrame,
    *,
    k: int = 4,
    dim: int = 64,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distribution drift between two corpus snapshots, measured in the
    trained cluster space: train k-means on snapshot A, assign BOTH
    snapshots to those centroids, and report per cluster
    (cid, n_a, n_b, share_a, share_b, share_delta, shift_sq) where
    ``shift_sq`` is the squared distance between A's trained centroid
    and B's population mean in that cluster.

    This is the monitoring number that triggers re-training: share
    deltas catch population re-balancing (a cluster growing from 10% to
    30% of traffic), shift_sq catches within-cluster semantic movement
    (the same share of vectors, somewhere else). Snapshot B clusters
    with no members report NULL mean shift (honest, not 0.0).

    Determinism: centroids and means use the floor-fixed-point
    discipline of kmeans_fit; shift_sq goes through exact BIGINT
    fixed-point self-dot of the (double-subtract) difference vector,
    one scale-back divide. Shares are one IEEE divide each off exact
    counts; share_delta is one IEEE subtract.

    Scale: one kmeans_fit on A (train on a sample at 100 TB), one
    broadcast-assignment pass per snapshot, one k-row join — no
    corpus-sized shuffle beyond the per-vector argmax windows.
    """
    from kinesis_stream_spark.operators.similarity import (
        _centroid_mean,
        _centroid_sums,
        assign_to_centroids,
        kmeans_fit,
    )

    fit = kmeans_fit(
        emb_a, k=k, dim=dim, iterations=iterations, id_col=id_col, vec_col=vec_col
    )
    # k rows, already a materialized local relation (kmeans_fit is
    # driver-iterated since r12 — the former lineage-cut checkpoint was
    # a leftover); carry the driver-side rows memo through the select
    # so both assignment passes skip the k-row collect job.
    cents = fit.select("cid", "centroid")
    cents._ksp_cent_rows = getattr(fit, "_ksp_cent_rows", None)
    a_counts = (
        assign_to_centroids(emb_a, cents, id_col=id_col, vec_col=vec_col)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    b_stats = (
        assign_to_centroids(emb_b, cents, id_col=id_col, vec_col=vec_col)
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[_centroid_sums(i, "v") for i in range(dim)],
        )
        .select(
            "cid",
            F.col("n").alias("n_b"),
            F.array(*[_centroid_mean(i) for i in range(dim)]).alias("mean_b"),
        )
    )
    tot_a = a_counts.agg(F.sum("n_a").alias("t_a"))
    tot_b = b_stats.agg(F.sum("n_b").alias("t_b"))
    diff = _residual(F.col("centroid"), F.col("mean_b"))
    return (
        cents.join(a_counts, "cid", "left")
        .join(b_stats, "cid", "left")
        .crossJoin(F.broadcast(tot_a))
        .crossJoin(F.broadcast(tot_b))
        .select(
            "cid",
            F.coalesce("n_a", F.lit(0).cast("long")).alias("n_a"),
            F.coalesce("n_b", F.lit(0).cast("long")).alias("n_b"),
            (
                F.coalesce("n_a", F.lit(0).cast("long")).cast("double")
                / F.col("t_a")
            ).alias("share_a"),
            (
                F.coalesce("n_b", F.lit(0).cast("long")).cast("double")
                / F.col("t_b")
            ).alias("share_b"),
            (
                F.coalesce("n_b", F.lit(0).cast("long")).cast("double")
                / F.col("t_b")
                - F.coalesce("n_a", F.lit(0).cast("long")).cast("double")
                / F.col("t_a")
            ).alias("share_delta"),
            (_dot_fx(diff, diff).cast("double") / SCALE).alias("shift_sq"),
        )
        .orderBy("cid")
    )


INERTIA_SCALE = 1 << 20


def label_inertia(
    emb: DataFrame,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label cluster inertia (within-class sum of squared
    distances to the class centroid) plus the grand '__all__' row —
    the k-means objective read off EXISTING labels: how compact each
    class is, and (between = all − Σ within, the ANOVA identity) how
    much of the corpus's variance the labels explain. The
    embedding-quality screen beside recall@k: labels whose within-SSE
    rivals the grand SSE carry no geometric signal, and a class whose
    inertia explodes between snapshots has drifted (the per-class
    refinement of :func:`embedding_drift`).

    No centroid is ever materialized: per (label, dim) the identity
    Σ‖x−μ‖² = (n·Σx² − (Σx)²)/n runs on exact fixed-point moments —
    elements floor into 2^20 BIGINT, Σx / Σx² accumulate in
    DECIMAL(38,0)/HUGEINT, the per-dim numerators add EXACTLY across
    dims, and the ONLY float op is one final VARCHAR-routed divide per
    output row. Vectors pass the :func:`~kinesis_stream_spark
    .functions.vectors.valid_vector` guard upstream (the caller's
    contract, same as every embeddings query); NULL labels form their
    own row (a profiler reports the unlabeled slice).

    Output: (label_key, n_vectors, inertia, mean_sq_radius) — label
    '__all__' is the whole-corpus row; inertia in squared value
    units, mean_sq_radius = inertia/n.

    Scale shape: one posexplode (64× map-local multiplier) → one
    combinable (label, dim) moment aggregate → a labels×64-row
    reduce. No join, no window, no centroid broadcast."""
    d38 = "decimal(38,0)"
    s2 = float(INERTIA_SCALE) * float(INERTIA_SCALE)
    base = emb.select(
        F.coalesce(F.col(label_col).cast("string"), F.lit("__null__")).alias(
            "lbl"
        ),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    ).select(
        "lbl",
        "pos",
        F.floor(F.col("x").cast("double") * F.lit(float(INERTIA_SCALE)))
        .cast("long")
        .alias("xfx"),
    )
    # '__all__' rides the SAME exploded pass: each element row fans
    # into (its label, '__all__') map-side — one corpus explode, not a
    # unionAll of two (which would scan + explode the table twice)
    levels = base.select(
        F.explode(
            F.array(F.col("lbl"), F.lit("__all__"))
        ).alias("lbl"),
        "pos",
        "xfx",
    )
    mom = levels.groupBy("lbl", "pos").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("xfx").cast(d38)).cast(d38).alias("sx"),
        F.sum(
            (F.col("xfx").cast("decimal(19,0)") * F.col("xfx")).cast(d38)
        )
        .cast(d38)
        .alias("sxx"),
    )
    per = mom.groupBy("lbl").agg(
        F.max("n").cast("long").alias("n_vectors"),
        F.sum(
            F.col("n").cast(d38) * F.col("sxx") - F.col("sx") * F.col("sx")
        )
        .cast(d38)
        .alias("num"),
    )
    inertia = F.expr("cast(cast(num as string) as double)") / (
        F.col("n_vectors").cast("double") * F.lit(s2)
    )
    return per.select(
        F.col("lbl").alias("label_key"),
        "n_vectors",
        F.when(F.col("n_vectors") > 0, inertia).alias("inertia"),
        F.when(
            F.col("n_vectors") > 0,
            inertia / F.col("n_vectors").cast("double"),
        ).alias("mean_sq_radius"),
    )


def sql_label_inertia(
    *,
    table: str = "embeddings",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle twin of :func:`label_inertia`."""
    s2 = float(INERTIA_SCALE) * float(INERTIA_SCALE)
    return f"""
    WITH base AS (
      SELECT COALESCE(CAST(t.{label_col} AS VARCHAR), '__null__') AS lbl,
             r.pos,
             CAST(FLOOR(CAST(t.{vec_col}[r.pos] AS DOUBLE)
                        * {float(INERTIA_SCALE)!r}) AS BIGINT) AS xfx
      FROM {table} t,
           UNNEST(RANGE(1, LEN(t.{vec_col}) + 1)) r(pos)),
    levels AS (
      SELECT lbl, pos, xfx FROM base
      UNION ALL SELECT '__all__', pos, xfx FROM base),
    mom AS (
      SELECT lbl, pos, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(xfx AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(xfx AS HUGEINT) * xfx) AS HUGEINT) AS sxx
      FROM levels GROUP BY 1, 2),
    per AS (
      SELECT lbl, CAST(MAX(n) AS BIGINT) AS n_vectors,
             CAST(SUM(CAST(n AS HUGEINT) * sxx - sx * sx) AS HUGEINT)
               AS num
      FROM mom GROUP BY 1)
    SELECT lbl AS label_key, n_vectors,
           CASE WHEN n_vectors > 0 THEN
             CAST(CAST(num AS VARCHAR) AS DOUBLE)
             / (CAST(n_vectors AS DOUBLE) * {s2!r}) END AS inertia,
           CASE WHEN n_vectors > 0 THEN
             CAST(CAST(num AS VARCHAR) AS DOUBLE)
             / (CAST(n_vectors AS DOUBLE) * {s2!r})
             / CAST(n_vectors AS DOUBLE) END AS mean_sq_radius
    FROM per
    """


def _centroid_sq_dists(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Shared core of :func:`simplified_silhouette` and
    :func:`centroid_confusion`: the (point × label-centroid) squared
    distance frame (vid, lbl, clabel, d2), centroid-free — per (point,
    label) the exact-integer identity Σ_d (n_c·x_d − sx_cd)² / n_c² on
    2^20 fixed-point elements (DECIMAL/HUGEINT sums), with d2 the ONE
    string-routed pinned divide per row. n·k rows out of an n·dim·k
    broadcast fan — the two combinable aggregates are the only
    shuffles."""
    d19, d38 = "decimal(19,0)", "decimal(38,0)"
    s2 = float(INERTIA_SCALE) * float(INERTIA_SCALE)
    base = emb.select(
        F.col(id_col).alias("vid"),
        F.coalesce(F.col(label_col).cast("string"), F.lit("__null__")).alias(
            "lbl"
        ),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    ).select(
        "vid",
        "lbl",
        "pos",
        F.floor(F.col("x").cast("double") * F.lit(float(INERTIA_SCALE)))
        .cast("long")
        .alias("xfx"),
    )
    cent = base.groupBy(F.col("lbl").alias("clabel"), "pos").agg(
        F.count(F.lit(1)).cast("long").alias("n_c"),
        F.sum(F.col("xfx").cast(d38)).cast(d38).alias("sx"),
    )
    diff = (
        F.col("n_c").cast(d19) * F.col("xfx").cast(d19) - F.col("sx")
    ).cast(d19)
    pd = (
        base.join(F.broadcast(cent), "pos")
        .select(
            "vid", "lbl", "clabel", "n_c", (diff * diff).cast(d38).alias("t")
        )
        .groupBy("vid", "lbl", "clabel")
        .agg(
            F.max("n_c").cast("long").alias("nc"),
            F.sum("t").cast(d38).alias("num"),
        )
    )
    d2 = F.expr("cast(cast(num as string) as double)") / (
        F.col("nc").cast("double") * F.col("nc").cast("double") * F.lit(s2)
    )
    return pd.select("vid", "lbl", "clabel", d2.alias("d2"))


def simplified_silhouette(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Simplified (centroid-based) silhouette per label plus the grand
    '__all__' row — the separation companion to :func:`label_inertia`:
    inertia says how COMPACT each class is; silhouette says whether
    points sit closer to their OWN centroid than to the nearest other
    one (Kaufman & Rousseeuw's simplified variant — a(i)/b(i) against
    centroids, not all pairs, which is what makes it linear instead of
    O(n²) and hence runnable at corpus scale). s(i) =
    (b − a)/max(a, b) with a = dist to own centroid, b = min dist to
    any other; misassigned points go negative, so n_negative is the
    "how many vectors would rather live elsewhere" count that recall@k
    can't see.

    Exactness: no centroid floats ever materialize — per (point,
    label) the squared distance Σ_d (x_d − sx_cd/n_c)² runs as the
    exact-integer identity Σ_d (n_c·x_d − sx_cd)² / n_c² on 2^20
    fixed-point elements (DECIMAL/HUGEINT sums, string-routed final
    divide — the :func:`label_inertia` discipline), then ONE IEEE
    sqrt per (point, label). The per-point score quantizes to
    floor(s·10^6) BIGINT so label means aggregate order-free; the
    mean avoids integer division entirely (sums can be negative and
    div/`//` disagree on negatives across engines) — it's the pinned
    double sum_fx/n/10^6. Singleton clusters score s = 1 by the
    formula (a = 0 — the point IS its centroid); a single-label corpus
    has no b and scores NULL (n_scored counts the scorable points).

    Output per label (+ '__all__'): (label_key, n_vectors, n_scored,
    n_negative, sum_sil_fx, mean_silhouette).

    Scale shape: one posexplode (dim× map-local multiplier) → one
    combinable (label, dim) moment aggregate (k·dim rows, broadcast
    back) → a broadcast join fanning each element row k ways →
    combinable (point, label) distance reduction → per-point k-row
    pivot → label rollup. Linear in n·dim·k; no point-point pairs, no
    corpus shuffle beyond the two combinable aggregates."""
    pd = _centroid_sq_dists(
        emb, id_col=id_col, label_col=label_col, vec_col=vec_col
    )
    dist = F.sqrt(F.col("d2"))
    per = (
        pd.select("vid", "lbl", "clabel", dist.alias("d"))
        .groupBy("vid", "lbl")
        .agg(
            F.min(F.when(F.col("clabel") == F.col("lbl"), F.col("d"))).alias(
                "a"
            ),
            F.min(F.when(F.col("clabel") != F.col("lbl"), F.col("d"))).alias(
                "b"
            ),
        )
    )
    g = F.greatest(F.col("a"), F.col("b"))
    sfx = (
        F.when(F.col("b").isNull(), F.lit(None).cast("long"))
        .when(g == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor((F.col("b") - F.col("a")) / g * F.lit(1000000.0)).cast(
                "long"
            )
        )
    )
    scored = per.select("lbl", sfx.alias("sfx"))
    levels = scored.select(
        F.explode(F.array(F.col("lbl"), F.lit("__all__"))).alias("lbl"),
        "sfx",
    )
    return levels.groupBy(F.col("lbl").alias("label_key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.count("sfx").cast("long").alias("n_scored"),
        F.coalesce(
            F.sum(F.when(F.col("sfx") < 0, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_negative"),
        F.coalesce(F.sum("sfx"), F.lit(0)).cast("long").alias("sum_sil_fx"),
        F.when(
            F.count("sfx") > 0,
            F.sum("sfx").cast("double")
            / F.count("sfx").cast("double")
            / F.lit(1000000.0),
        ).alias("mean_silhouette"),
    )


def sql_simplified_silhouette(
    *,
    table: str = "embeddings",
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle twin of :func:`simplified_silhouette`."""
    s2 = float(INERTIA_SCALE) * float(INERTIA_SCALE)
    return f"""
    WITH base AS (
      SELECT t.{id_col} AS vid,
             COALESCE(CAST(t.{label_col} AS VARCHAR), '__null__') AS lbl,
             r.pos,
             CAST(FLOOR(CAST(t.{vec_col}[r.pos] AS DOUBLE)
                        * {float(INERTIA_SCALE)!r}) AS BIGINT) AS xfx
      FROM {table} t,
           UNNEST(RANGE(1, LEN(t.{vec_col}) + 1)) r(pos)),
    cent AS (
      SELECT lbl AS clabel, pos, CAST(COUNT(*) AS BIGINT) AS n_c,
             CAST(SUM(CAST(xfx AS HUGEINT)) AS HUGEINT) AS sx
      FROM base GROUP BY 1, 2),
    pd AS (
      SELECT b.vid, b.lbl, c.clabel, CAST(MAX(c.n_c) AS BIGINT) AS nc,
             CAST(SUM((CAST(c.n_c AS HUGEINT) * b.xfx - c.sx)
                      * (CAST(c.n_c AS HUGEINT) * b.xfx - c.sx))
                  AS HUGEINT) AS num
      FROM base b JOIN cent c ON c.pos = b.pos
      GROUP BY 1, 2, 3),
    dists AS (
      SELECT vid, lbl, clabel,
             SQRT(CAST(CAST(num AS VARCHAR) AS DOUBLE)
                  / (CAST(nc AS DOUBLE) * CAST(nc AS DOUBLE) * {s2!r}))
               AS d
      FROM pd),
    per AS (
      SELECT vid, lbl,
             MIN(CASE WHEN clabel = lbl THEN d END) AS a,
             MIN(CASE WHEN clabel != lbl THEN d END) AS b
      FROM dists GROUP BY 1, 2),
    scored AS (
      SELECT lbl,
             CASE WHEN b IS NULL THEN NULL
                  WHEN GREATEST(a, b) = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(FLOOR((b - a) / GREATEST(a, b) * 1000000.0)
                            AS BIGINT) END AS sfx
      FROM per),
    levels AS (
      SELECT lbl, sfx FROM scored
      UNION ALL SELECT '__all__', sfx FROM scored)
    SELECT lbl AS label_key,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(COUNT(sfx) AS BIGINT) AS n_scored,
           CAST(COALESCE(SUM(CASE WHEN sfx < 0 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_negative,
           CAST(COALESCE(SUM(sfx), 0) AS BIGINT) AS sum_sil_fx,
           CASE WHEN COUNT(sfx) > 0 THEN
             CAST(SUM(sfx) AS DOUBLE) / CAST(COUNT(sfx) AS DOUBLE)
             / 1000000.0 END AS mean_silhouette
    FROM levels GROUP BY 1
    """


def centroid_confusion(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid confusion matrix: assign every vector to its
    closest label centroid and cross-tabulate assignments against the
    true labels — the "would a centroid classifier recover these
    labels" audit that turns :func:`simplified_silhouette`'s n_negative
    into WHICH classes bleed into which (the pair of labels a merge or
    re-labeling pass should look at first). Diagonal share ≈ centroid-
    classifier accuracy per class.

    Assignment is an exact argmin: squared distances from the shared
    :func:`_centroid_sq_dists` frame (exact-integer numerators, one
    pinned divide), ranked per point by (d2, clabel) — the label
    tie-break makes equidistant points deterministic on both engines —
    and row_number 1 wins. No sqrt is needed (monotone). Shares are
    integer ppm of the true-label row.

    Output per observed (true, assigned) pair: (label_key,
    assigned_key, n_vectors, row_share_ppm, is_correct), dense only in
    observed pairs (a zero cell is absent, as in every contingency
    frame here).

    Scale shape: the shared frame's two combinable aggregates + one
    per-point k-row window (partitioned by point id — never global) +
    one combinable pair count; the row totals ride a broadcast join of
    the k-row label-total frame."""
    pd = _centroid_sq_dists(
        emb, id_col=id_col, label_col=label_col, vec_col=vec_col
    )
    # asc_nulls_last matches DuckDB's ASC default (NULLS LAST): a NULL
    # distance (a label NULL at every position the point occupies) must
    # lose the argmin on BOTH engines, not win Spark's NULLS-FIRST sort
    w = Window.partitionBy("vid").orderBy(
        F.asc_nulls_last("d2"), "clabel"
    )
    assigned = (
        pd.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vid", "lbl", "clabel")
    )
    conf = assigned.groupBy(
        F.col("lbl").alias("label_key"), F.col("clabel").alias("assigned_key")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
    rowtot = conf.groupBy(F.col("label_key").alias("_lk")).agg(
        F.sum("n_vectors").cast("long").alias("row_n")
    )
    return (
        conf.join(
            F.broadcast(rowtot), F.col("label_key") == F.col("_lk")
        )
        .select(
            "label_key",
            "assigned_key",
            "n_vectors",
            F.expr(
                "cast(cast(n_vectors as decimal(38,0)) * 1000000"
                " div row_n as long)"
            ).alias("row_share_ppm"),
            (F.col("label_key") == F.col("assigned_key")).alias("is_correct"),
        )
    )


def sql_centroid_confusion(
    *,
    table: str = "embeddings",
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle twin of :func:`centroid_confusion`."""
    s2 = float(INERTIA_SCALE) * float(INERTIA_SCALE)
    return f"""
    WITH base AS (
      SELECT t.{id_col} AS vid,
             COALESCE(CAST(t.{label_col} AS VARCHAR), '__null__') AS lbl,
             r.pos,
             CAST(FLOOR(CAST(t.{vec_col}[r.pos] AS DOUBLE)
                        * {float(INERTIA_SCALE)!r}) AS BIGINT) AS xfx
      FROM {table} t,
           UNNEST(RANGE(1, LEN(t.{vec_col}) + 1)) r(pos)),
    cent AS (
      SELECT lbl AS clabel, pos, CAST(COUNT(*) AS BIGINT) AS n_c,
             CAST(SUM(CAST(xfx AS HUGEINT)) AS HUGEINT) AS sx
      FROM base GROUP BY 1, 2),
    pd AS (
      SELECT b.vid, b.lbl, c.clabel, CAST(MAX(c.n_c) AS BIGINT) AS nc,
             CAST(SUM((CAST(c.n_c AS HUGEINT) * b.xfx - c.sx)
                      * (CAST(c.n_c AS HUGEINT) * b.xfx - c.sx))
                  AS HUGEINT) AS num
      FROM base b JOIN cent c ON c.pos = b.pos
      GROUP BY 1, 2, 3),
    dists AS (
      SELECT vid, lbl, clabel,
             CAST(CAST(num AS VARCHAR) AS DOUBLE)
             / (CAST(nc AS DOUBLE) * CAST(nc AS DOUBLE) * {s2!r}) AS d2
      FROM pd),
    assigned AS (
      SELECT vid, lbl, clabel
      FROM (SELECT vid, lbl, clabel,
                   ROW_NUMBER() OVER (PARTITION BY vid
                                      ORDER BY d2, clabel) AS rn
            FROM dists)
      WHERE rn = 1),
    conf AS (
      SELECT lbl AS label_key, clabel AS assigned_key,
             CAST(COUNT(*) AS BIGINT) AS n_vectors
      FROM assigned GROUP BY 1, 2),
    rowtot AS (
      SELECT label_key AS lk, CAST(SUM(n_vectors) AS BIGINT) AS row_n
      FROM conf GROUP BY 1)
    SELECT c.label_key, c.assigned_key, c.n_vectors,
           CAST(CAST(c.n_vectors AS HUGEINT) * 1000000 // r.row_n
                AS BIGINT) AS row_share_ppm,
           (c.label_key = c.assigned_key) AS is_correct
    FROM conf c JOIN rowtot r ON r.lk = c.label_key
    """
