"""Sanity bounds for the approximate estimators (agg_approx_sketches).

The query emits ratio-to-exact bucket columns (``round(approx/exact, 1)``)
so the DuckDB oracle can hash-match the accuracy bound; these tests pin
the tighter local invariants — HLL++ within its configured rsd and the
quantile sketch within 5% of the exact percentile — directly against the
exact twins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_stream_spark.queries.relational import QUERIES
from kinesis_stream_spark.sources.batch import load_table


def test_sketch_ratios_round_to_one(spark, sf_dir):
    rows = QUERIES["agg_approx_sketches"](spark, sf_dir).collect()
    assert rows, "expected one row per return flag"
    for r in rows:
        assert r["orders_ratio"] == 1.0, r
        assert r["p50_ratio"] == 1.0, r
        assert r["p99_ratio"] == 1.0, r


def test_exact_orders_match_count_distinct(spark, sf_dir):
    got = {
        r["l_returnflag"]: r["exact_orders"]
        for r in QUERIES["agg_approx_sketches"](spark, sf_dir).collect()
    }
    want = {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert got == want


def test_approx_estimators_within_bounds(spark, sf_dir):
    """Tighter-than-ratio bounds on the raw estimators (recomputed here
    since the query output carries only the rounded ratios)."""
    li = load_table(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact_n"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_n"),
            F.expr("percentile(l_extendedprice, array(0.5, 0.99))").alias("eps"),
            F.expr(
                "approx_percentile(l_extendedprice, array(0.5, 0.99), 10000)"
            ).alias("aps"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # rsd=0.02 → allow 5 sigma
        assert abs(r["approx_n"] - r["exact_n"]) <= max(0.10 * r["exact_n"], 5), r
        for approx, exact in zip(r["aps"], r["eps"]):
            assert r["lo"] <= approx <= r["hi"]
            # accuracy 10000 → rank error ≤ n/10000; generous value tolerance
            assert abs(approx - exact) / max(exact, 1.0) < 0.05, r
