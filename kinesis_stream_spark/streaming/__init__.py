"""Streaming core: the reference's consumer surface on Structured Streaming.

Reference mapping (SURVEY.md §2.1):

- O1 source           → :mod:`consumer` (``source(spark, config)``)
- O2 commitFlow       → :mod:`delivery` (micro-batch commit; placement ≙
                        at-least-once / at-most-once recipes)
- O4 checkpoint       → Spark offset+commit log at ``checkpointLocation``
                        (+ :mod:`kinesis_stream_spark.checkpoint` parity)
- O5 initial position → ``InitialPosition`` (latest / trim-horizon /
                        at-timestamp, `Consumer.scala:125-143`)
- O6 drain/shutdown   → ``StreamingQuery.stop`` + commit log (batch is
                        atomic: fully committed or re-run)
- record model        → :mod:`envelope` (`Record.scala:13-23`)

Event-time operators (tumbling/sliding/session windows, watermark late-data
drop, stateful dedup) live in :mod:`windows` and are written against plain
DataFrames so the SAME code runs in batch (oracle-checkable) and streaming.
"""

from kinesis_stream_spark.streaming.consumer import ConsumerConfig, InitialPosition, source
from kinesis_stream_spark.streaming.envelope import (
    RECORD_SCHEMA,
    decode_json_payload,
    events_to_envelope,
)

__all__ = [
    "ConsumerConfig",
    "InitialPosition",
    "RECORD_SCHEMA",
    "decode_json_payload",
    "events_to_envelope",
    "source",
]
