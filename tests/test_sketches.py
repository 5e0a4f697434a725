"""Sanity bounds for the approximate estimators (agg_approx_sketches):
sketches have no cross-engine oracle, so anchor them against their exact
twins instead — HLL++ within its configured rsd, quantile sketch inside
the min/max envelope and near the exact percentile."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_stream_spark.queries.relational import QUERIES
from kinesis_stream_spark.sources.batch import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    approx = {
        r["l_returnflag"]: r["approx_orders"]
        for r in QUERIES["agg_approx_sketches"](spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, n in exact.items():
        # rsd=0.02 → allow 5 sigma
        assert abs(approx[flag] - n) <= max(0.10 * n, 5), (flag, approx[flag], n)


def test_approx_percentile_within_envelope(spark, sf_dir):
    rows = QUERIES["agg_approx_sketches"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.5, 0.99))").alias("p"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    for r in rows:
        e = exact[r["l_returnflag"]]
        p50, p99 = r["approx_price_p50"], r["approx_price_p99"]
        assert e["lo"] <= p50 <= e["hi"] and e["lo"] <= p99 <= e["hi"]
        # accuracy 10000 → rank error ≤ n/10000; generous value tolerance
        assert abs(p50 - e["p"][0]) / max(e["p"][0], 1.0) < 0.05
        assert abs(p99 - e["p"][1]) / max(e["p"][1], 1.0) < 0.05
