"""SparkSession factory tuned for this engine.

Scale stance: these confs are the local-mode projection of a
1000-executor deployment. AQE handles runtime re-planning (partition
coalescing, skew-join splitting); shuffle partitions default to
2x cores locally and would be sized to ~128 MB post-shuffle partitions
on a real cluster; Arrow is on so every Pandas-UDF hop is vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    except ValueError:
        return os.cpu_count() or 4


def get_spark(
    app_name: str = "kinesis-stream-spark",
    *,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    Every conf below is a deliberate scale decision:

    - AQE on: runtime partition coalescing + skew-join handling replace
      hand-tuned shuffle sizing when data volume varies by 1000x.
    - ``autoBroadcastJoinThreshold`` 64 MB: the TPC-H-ish dims (region,
      nation, supplier, part at low SF) should always broadcast; at
      100 TB the fact tables never will, so the threshold only upgrades
      dim joins.
    - Arrow on: pandas_udf / mapInPandas paths move data in columnar
      batches instead of pickled rows.
    - Session timezone UTC: deterministic timestamp semantics that match
      the DuckDB oracle (naive UTC timestamps in parquet).
    """
    cpus = _cpus()
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
