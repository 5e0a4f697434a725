"""Bucketed co-located joins — the 100 TB fact⋈fact strategy, proven.

The relational docstrings claim lineitem⋈orders "would be bucketed on
orderkey at scale" to eliminate the shuffle. This test actually builds
the bucketed tables and asserts the join plan contains NO shuffle
exchange — turning the runbook claim into an executable property.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_stream_spark.sources.batch import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    n_buckets = 8
    for table, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        name = f"b_{table}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            load_table(spark, sf_dir, table)
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .option("path", str(warehouse / name))  # external: keep repo cwd clean
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield
    for name in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    # disable broadcast: at test SF the dims fit a broadcast, which would
    # dodge the property under test (at 100 TB neither side broadcasts)
    original = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.table("b_lineitem")
        orders = spark.table("b_orders")
        joined = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", original)
    join_section = plan.split("HashAggregate")[0]
    # both sides read pre-bucketed data: the join itself needs no exchange
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange" not in join_section, join_section


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed):
    li, orders = load_table(spark, sf_dir, "lineitem"), load_table(
        spark, sf_dir, "orders"
    )
    want = {
        (r.o_orderpriority, r.n)
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        (r.o_orderpriority, r.n)
        for r in spark.table("b_lineitem")
        .join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0
