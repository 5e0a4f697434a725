"""Physical-plan shape assertions — the scale contract, enforced.

Correctness tests prove the right rows come out; these prove the right
PLAN produces them: filters reach the parquet scan, scans prune columns,
small dimensions broadcast, map-only operators stay exchange-free. Each
is a property that silently degrading would multiply cost at 100 TB
without failing any value-based test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_stream_spark.sources.batch import load_table


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R")
    )
    plan = _explain(df)
    assert "PushedFilters:" in plan
    assert "GreaterThan(l_quantity" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_column_pruning_reaches_parquet_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = _explain(df)
    # ReadSchema must carry ONLY the projected columns
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema and "l_comment" not in read_schema


def test_small_dimension_joins_broadcast(spark, sf_dir):
    from kinesis_stream_spark.queries.relational import QUERIES

    # Q5-shape: nation/region/supplier dims must not shuffle the fact side
    plan = _explain(QUERIES["q05_regional_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_decontamination_probe_side_broadcasts(spark, sf_dir):
    from kinesis_stream_spark.queries.text import QUERIES

    plan = _explain(QUERIES["text_decontaminate_overlap"](spark, sf_dir))
    # the probe grams build the broadcast (right) side of the left-outer
    # join; the corpus (left, big) side must be the streamed side
    assert "BroadcastHashJoin LeftOuter BuildRight" in plan


def test_stratified_sample_is_map_only(spark, sf_dir):
    from kinesis_stream_spark.operators.text import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    plan = _explain(stratified_sample(docs, {"en": 0.5}, stratum_col="lang"))
    # a sampling FILTER must never shuffle: no exchange of any kind
    assert "Exchange" not in plan


def test_pack_sequences_partitions_by_source_not_global_sort(spark, sf_dir):
    from kinesis_stream_spark.operators.text import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    plan = _explain(pack_sequences(docs, capacity=512))
    # the running-sum window must hash-partition by source; a global
    # (single-partition) window would appear as Exchange SinglePartition
    assert "hashpartitioning(source" in plan
    assert "SinglePartition" not in plan


def test_whole_stage_codegen_covers_scan_filter_agg(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 10)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # AQE hides codegen spans until the final plan exists — execute first.
    # Codegen stages print as "*(n) Operator" in the executed-plan string.
    import re

    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    spans = set(re.findall(r"\*\((\d+)\)", executed))
    assert spans, f"no whole-stage-codegen spans in:\n{executed[:500]}"
    # scan→filter→partial-agg must fuse into ONE span, final agg another
    assert "*(1) Filter" in executed and "*(1) HashAggregate" in executed
