"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's one stateful algorithm keeps per-shard state across
callbacks (tracked/processed sets in
`checkpoint/ShardCheckpointTrackerActor.scala:18-22`, serialized by the
actor). Spark's equivalent primitive is a keyed state store updated once
per micro-batch; ``applyInPandasWithState`` exposes it to Python with
Arrow batching.

Operators:

- ``running_totals``: per-key running count/sum maintained across
  micro-batches — the general shape of the reference's per-shard
  accumulation, keyed by any column instead of shardId.
- ``high_watermark_tracker``: per-shard max-contiguous-committed sequence
  tracking as a streaming operator — the reference's low-watermark commit
  protocol (`ShardCheckpointTrackerActor.scala:86`) expressed over an
  unbounded keyed stream. The pure-algorithm twin (batch, unit-tested
  1:1 against the reference spec) lives in checkpoint/tracker.py.

Scale notes: state is per-key in the state store (RocksDB provider on a
real cluster — set ``spark.sql.streaming.stateStore.providerClass``);
the shuffle is on the group key once per batch. Keys must be bounded
(shards, devices, sessions) — an unbounded key space needs timeouts
(``GroupStateTimeout``) to evict, which ``running_totals`` demonstrates.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd

from pyspark import cloudpickle
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_RUNNING_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total_cents", LongType())]
)


def _running_totals_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, exact cents sum) across micro-batches; emit the
    running totals once per batch. Cents (int) accumulation keeps the
    running sum exact regardless of batch slicing."""
    n, total_cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total_cents += int(round(float(pdf["value"].sum()) * 100))
    state.update((n, total_cents))
    yield pd.DataFrame(
        {"key": [key[0]], "n_events": [n], "sum_value": [total_cents / 100.0]}
    )


def running_totals(events: DataFrame, *, key_col: str = "event_type") -> DataFrame:
    """Per-key running count/sum across the whole stream (state lives in
    the state store; output mode: update)."""
    return (
        events.selectExpr(f"{key_col} AS key", "value")
        .groupBy("key")
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


WATERMARK_SCHEMA = StructType(
    [
        StructField("shard_id", StringType()),
        StructField("checkpointable", LongType()),
        StructField("n_pending", LongType()),
    ]
)

_WATERMARK_STATE_SCHEMA = StructType(
    [
        StructField("committed", LongType()),
        StructField("pending", StringType()),  # csv of out-of-order seqs
    ]
)


def _watermark_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Contiguous-prefix tracking per shard: the highest N such that all
    sequence numbers ≤ N have arrived (the reference's `getCheckpointable
    = tracked.takeWhile(processed.contains)` as stream state)."""
    committed, pending_csv = state.get if state.exists else (-1, "")
    pending = set(int(x) for x in pending_csv.split(",") if x)
    for pdf in pdfs:
        pending.update(int(s) for s in pdf["seq"])
    while committed + 1 in pending:
        committed += 1
        pending.discard(committed)
    # late/duplicate acks at or below the committed prefix are dropped,
    # mirroring ShardCheckpointTrackerActor.scala:35-37
    pending = {s for s in pending if s > committed}
    state.update((committed, ",".join(str(s) for s in sorted(pending))))
    yield pd.DataFrame(
        {
            "shard_id": [key[0]],
            "checkpointable": [committed],
            "n_pending": [len(pending)],
        }
    )


def high_watermark_tracker(records: DataFrame) -> DataFrame:
    """Per-shard contiguous-prefix commit point over a stream of
    (shardId, sequenceNumber) arrivals — out-of-order arrivals advance
    the commit point only once the gap fills."""
    return (
        records.selectExpr(
            "shardId AS shard_id", "CAST(sequenceNumber AS BIGINT) AS seq"
        )
        .groupBy("shard_id")
        .applyInPandasWithState(
            _watermark_fn,
            outputStructType=WATERMARK_SCHEMA,
            stateStructType=_WATERMARK_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# Ship function bodies by value — executors must not need this package
# importable (see functions/udfs.py).
cloudpickle.register_pickle_by_value(sys.modules[__name__])
