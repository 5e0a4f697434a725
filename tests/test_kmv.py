"""KMV bottom-k distinct sketch: hand-replayed order statistics and
the bottom-k plan shape (operators/kmv.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kinesis_stream_spark.operators.kmv import KMV_K, KMV_NUM, kmv_distinct


def _h(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def test_small_column_estimate_is_exact(spark):
    # fewer distincts than k: the sketch IS the distinct-hash set and
    # the estimate is exactly its size — no extrapolation
    df = spark.createDataFrame(
        [(v,) for v in [1, 2, 2, 3, None, 3, 3]], "v: int"
    )
    row = kmv_distinct(df, ["v"]).collect()[0]
    assert row["column_name"] == "v"
    assert row["exact_distinct"] == 3
    assert row["n_sketch"] == 3
    assert row["kmv_estimate"] == 3.0
    assert row["rel_err"] == 0.0


def test_kth_order_statistic_replayed_in_python(spark):
    # more distincts than k: kth_min_hash is the k-th smallest md5
    # hash and the estimate is (k-1)*2^60 / h_(k), replayed off-engine
    vals = list(range(3000))
    df = spark.createDataFrame([(v,) for v in vals], "v: int")
    row = kmv_distinct(df, ["v"]).collect()[0]
    hashes = sorted(_h(v) for v in vals)
    hk = hashes[KMV_K - 1]
    assert row["n_sketch"] == KMV_K
    assert row["kth_min_hash"] == hk
    assert row["kmv_estimate"] == KMV_NUM / float(hk)
    # sanity: the estimate lands near the truth (k=256 -> ~6% sigma)
    assert abs(row["rel_err"]) < 0.25


def test_all_null_column_yields_zero_estimate_null_err(spark):
    df = spark.createDataFrame([(None,), (None,)], "v: int")
    row = kmv_distinct(df, ["v"]).collect()[0]
    assert row["exact_distinct"] == 0
    assert row["n_sketch"] == 0
    assert row["kmv_estimate"] == 0.0
    assert row["rel_err"] is None


def test_bottom_k_plans_as_take_ordered(spark, sf_dir):
    # the global bottom-k must be TakeOrderedAndProject (per-partition
    # k-row prune before a single-partition merge), never a full Sort
    from kinesis_stream_spark.sources.batch import load_table
    from tests.test_plans import _explain

    li = load_table(spark, sf_dir, "lineitem")
    plan = _explain(kmv_distinct(li, ["l_orderkey"]))
    assert "TakeOrderedAndProject" in plan
    # the dedup before it is a two-phase HashAggregate (map-side
    # partial), not an Exchange of raw rows
    assert plan.count("HashAggregate") >= 2


def test_merged_sketch_equals_rescan(spark):
    # mergeability: bottom-k of (bottom-k(A) UNION bottom-k(B)) equals
    # bottom-k(A UNION B) — the property that lets per-day sketches
    # roll up without rescanning history
    a = spark.createDataFrame([(v,) for v in range(0, 2000)], "v: int")
    b = spark.createDataFrame([(v,) for v in range(1000, 4000)], "v: int")
    u = a.unionAll(b)
    direct = kmv_distinct(u, ["v"]).collect()[0]

    def bottom(df):
        from kinesis_stream_spark.functions.hashing import md5_int64

        return (
            df.select(md5_int64(F.col("v").cast("string")).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(KMV_K)
        )

    merged = bottom(a).unionAll(bottom(b)).distinct().orderBy("h").limit(KMV_K)
    hk = merged.agg(F.max("h")).collect()[0][0]
    assert hk == direct["kth_min_hash"]


class TestKmvSetOps:
    def _run(self, spark, av, bv):
        from kinesis_stream_spark.operators.kmv import kmv_set_ops

        a = spark.createDataFrame([(v,) for v in av] or [(None,)], "v: int")
        b = spark.createDataFrame([(v,) for v in bv] or [(None,)], "v: int")
        return {
            r["set_op"]: r
            for r in kmv_set_ops(a, b, col_a="v", col_b="v").collect()
        }

    def test_small_sets_are_exact(self, spark):
        # everything fits in the sketch: every estimate is exact
        got = self._run(spark, [1, 2, 3, 4], [3, 4, 5])
        assert got["a"]["estimate"] == 4.0 and got["a"]["rel_err"] == 0.0
        assert got["b"]["estimate"] == 3.0
        assert got["union"]["estimate"] == 5.0
        assert got["intersection"]["estimate"] == 2.0
        assert got["jaccard"]["exact"] == 0.4
        assert got["jaccard"]["estimate"] == 0.4

    def test_disjoint_sets(self, spark):
        got = self._run(spark, [1, 2], [3, 4])
        assert got["intersection"]["estimate"] == 0.0
        assert got["jaccard"]["estimate"] == 0.0
        assert got["jaccard"]["exact"] == 0.0

    def test_large_overlap_estimates_land_near_truth(self, spark):
        av = list(range(0, 3000))
        bv = list(range(1500, 4500))
        got = self._run(spark, av, bv)
        for op, truth in [("a", 3000), ("b", 3000), ("union", 4500),
                          ("intersection", 1500)]:
            assert abs(got[op]["estimate"] - truth) / truth < 0.35, (
                op, got[op]["estimate"])
        assert abs(got["jaccard"]["estimate"] - 1 / 3) < 0.15

    def test_empty_side(self, spark):
        got = self._run(spark, [], [1, 2])
        assert got["a"]["estimate"] == 0.0 and got["a"]["rel_err"] is None
        assert got["union"]["estimate"] == 2.0
        assert got["jaccard"]["exact"] == 0.0
