"""Batch parquet sources for the driver's TPC-H-ish tables.

Scan discipline (100 TB): always ``spark.read.parquet`` so Catalyst owns
predicate pushdown, column pruning and partition pruning; callers
``select`` early so ``ReadSchema`` stays narrow. No schema inference
cost: parquet footers carry the schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS): Spark has no nanos type, so
        # read it as LONG (legacy conf) and truncate to micros — the same
        # truncation DuckDB applies, keeping the oracle bit-identical.
        # Integer `div` (not `/`): ns-since-epoch exceeds double's 53-bit
        # mantissa, float division would corrupt low-order digits.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _scan_partition_estimate(df: DataFrame) -> int | None:
    """Estimate the partition count a file-backed scan will produce,
    WITHOUT forcing physical planning (``df.rdd`` plans + converts the
    whole query per call — wasteful when every expansion operator asks).

    Mirrors ``FilePartition.maxSplitBytes``: each file contributes
    ``openCostInBytes``-padded bytes, packed into splits of
    ``min(maxPartitionBytes, max(openCost, totalPadded/parallelism))``.
    The estimate only feeds a direction decision (is the scan parallel
    enough?), so pack-boundary error is irrelevant. Returns None for
    non-file-backed plans (in-memory test frames)."""
    files = df.inputFiles()
    if not files:
        return None
    spark = df.sparkSession
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in files:
        path = jvm.org.apache.hadoop.fs.Path(f)
        total += path.getFileSystem(hconf).getFileStatus(path).getLen()
    as_bytes = jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes
    open_cost = as_bytes(spark.conf.get("spark.sql.files.openCostInBytes", "4194304"))
    max_pb = as_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    parallelism = max(spark.sparkContext.defaultParallelism, 1)
    padded = total + len(files) * open_cost
    max_split = min(max_pb, max(open_cost, padded // parallelism))
    return max(1, -(-padded // max(max_split, 1)))


def spread(df: DataFrame, key_col: str | None = None, *, min_partitions: int | None = None) -> DataFrame:
    """Raise scan parallelism for under-partitioned inputs.

    A single-row-group parquet file scans as ONE task, and everything
    between the scan and the first exchange — shingling, per-gram md5,
    signature folds, decode kernels — then serializes on one core.
    When the input has fewer partitions than ``min_partitions`` (default
    ``sparkContext.defaultParallelism``), hash-repartition (on
    ``key_col`` when given) so the expansion work spreads across the
    cluster; when the scan is already parallel — the normal case at
    real scale, where inputs have many files/row groups — this is a
    NO-OP, so well-partitioned pipelines never pay the extra exchange.

    The partition count comes from a lazy file-size estimate
    (:func:`_scan_partition_estimate`) — a LOWER bound, since
    ``inputFiles()`` deduplicates files across union branches that scan
    the same table twice. An estimate at-or-above target proves the
    scan parallel enough with no physical planning at all (the common
    well-partitioned case); only when the estimate falls short does the
    precise ``df.rdd.getNumPartitions()`` check run, so a union of two
    scans over an already-parallel file never pays a spurious exchange.
    Streaming DataFrames pass through untouched: micro-batch planning
    owns their parallelism, and ``.rdd`` would throw.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    estimate = _scan_partition_estimate(df)
    if estimate is not None and estimate >= target:
        return df
    if df.rdd.getNumPartitions() >= target:
        return df
    if key_col is not None:
        return df.repartition(target, F.col(key_col))
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view (enables the spark.sql surface)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
