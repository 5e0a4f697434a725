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
- O7 error taxonomy   → :mod:`errors` (transient/stop-shard/fatal
                        classification, kill switch, termination listener —
                        `RecordProcessorImpl.scala:126-148,214-221`)
- O8 config           → ``ConsumerConfig`` (+ ``from_config`` with the
                        reference's key names, `Consumer.scala:113-187`)
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
from kinesis_stream_spark.streaming.errors import (
    CheckpointTimeoutError,
    DependencyError,
    Disposition,
    KillSwitch,
    ShardShutdownError,
    ThrottlingError,
    abort_stream_on_error,
    checkpoint_with_taxonomy,
    classify,
    make_termination_listener,
)

__all__ = [
    "CheckpointTimeoutError",
    "ConsumerConfig",
    "DependencyError",
    "Disposition",
    "InitialPosition",
    "KillSwitch",
    "RECORD_SCHEMA",
    "ShardShutdownError",
    "ThrottlingError",
    "abort_stream_on_error",
    "checkpoint_with_taxonomy",
    "classify",
    "decode_json_payload",
    "events_to_envelope",
    "make_termination_listener",
    "source",
]
