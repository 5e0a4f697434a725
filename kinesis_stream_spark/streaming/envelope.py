"""The record envelope — the reference's single data type on Spark.

`Record.scala:13-23` defines the one row type; §1.4 of SURVEY.md fixes its
Spark schema. The payload stays opaque ``BINARY`` (`Record.scala:15` —
ByteString, no schema); consumers decode with ``from_json``/``cast``, the
exact pattern of `examples/src/main/scala/Main.scala:22` (`data.utf8String`).

``markProcessed`` (`Record.scala:20`) has no column: commit is the engine's
job in Spark (per-micro-batch offset log), see ``delivery`` and the
checkpoint parity module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Spark schema of the reference's `Record` (SURVEY.md §1.4 table).
RECORD_SCHEMA = StructType(
    [
        StructField("partitionKey", StringType(), nullable=False),
        StructField("data", BinaryType(), nullable=True),
        StructField("sequenceNumber", StringType(), nullable=False),
        StructField("subSequenceNumber", LongType(), nullable=False),
        StructField("shardId", StringType(), nullable=False),
        StructField("approximateArrivalTimestamp", TimestampType(), nullable=False),
    ]
)


def _shard_id(partition_key: Column, n_shards: int) -> Column:
    """Deterministic key→shard assignment (Kinesis hashes the partition key
    to a shard's hash-key range; modulo is the test-transport stand-in)."""
    return F.concat(
        F.lit("shardId-"),
        F.lpad(F.pmod(F.xxhash64(partition_key), F.lit(n_shards)).cast("string"), 12, "0"),
    )


def events_to_envelope(events: DataFrame, *, n_shards: int = 4) -> DataFrame:
    """Wrap the `events` table in the Kinesis record envelope.

    - partitionKey ≙ user_id (per-key ordering unit)
    - data ≙ UTF-8 JSON of the business payload (opaque bytes downstream)
    - sequenceNumber ≙ event_id (monotone within the stream, so also within
      each shard — matching KCL's per-shard ordering guarantee)
    - approximateArrivalTimestamp ≙ ts (the event-time/watermark column)

    Works identically on batch and streaming inputs.
    """
    pk = F.col("user_id").cast("string")
    return events.select(
        pk.alias("partitionKey"),
        F.encode(F.to_json(F.struct("event_type", "value", "props")), "UTF-8").alias("data"),
        F.col("event_id").cast("string").alias("sequenceNumber"),
        F.lit(0).cast("long").alias("subSequenceNumber"),
        _shard_id(pk, n_shards).alias("shardId"),
        F.col("ts").alias("approximateArrivalTimestamp"),
    )


#: payload schema carried in `data` by :func:`events_to_envelope`
PAYLOAD_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def decode_json_payload(records: DataFrame, schema: StructType = PAYLOAD_SCHEMA) -> DataFrame:
    """User-side payload decode (`Main.scala:22`'s ``utf8String`` + parse):
    opaque bytes → typed columns, keeping the envelope metadata."""
    return records.withColumn(
        "payload", F.from_json(F.col("data").cast("string"), schema)
    ).select("*", "payload.*")
