"""Behavioral parity tests for the checkpoint tracker, transcribed case-by-
case from the reference specs (semantics only, no code):

- `ShardCheckpointTrackerActorSpec.scala` — per-shard ack/checkpoint rules
- `CheckpointTrackerActorSpec.scala` — worker-level shard registry rules
"""

from __future__ import annotations

import pytest

from kinesis_stream_spark.checkpoint import (
    CheckpointConfig,
    CheckpointTracker,
    SequenceNumber,
    ShardCheckpointTracker,
    ShutdownException,
    TrackerInactiveError,
)


def sq(*nums: int) -> list[SequenceNumber]:
    return [SequenceNumber(n) for n in nums]


class FakeClock:
    def __init__(self) -> None:
        self.now = 0.0

    def __call__(self) -> float:
        return self.now

    def advance(self, s: float) -> None:
        self.now += s


class RecordingCheckpointer:
    def __init__(self) -> None:
        self.calls: list[SequenceNumber] = []

    def __call__(self, seq: SequenceNumber) -> None:
        self.calls.append(seq)


@pytest.fixture()
def clock() -> FakeClock:
    return FakeClock()


def make(clock: FakeClock, buffer: int = 10_000, duration: float = 60.0) -> ShardCheckpointTracker:
    return ShardCheckpointTracker(
        "shardId-000",
        CheckpointConfig(max_buffer_size=buffer, max_duration_s=duration),
        clock=clock,
    )


# --- ShardCheckpointTrackerActorSpec cases ---------------------------------


def test_tracked_but_unprocessed_not_checkpointable(clock):
    # spec :53-63
    t = make(clock)
    t.track(sq(1, 2, 3))
    assert t.checkpointable() == []


def test_processing_lowest_makes_checkpointable(clock):
    # spec :85-98
    t = make(clock)
    t.track(sq(1, 2, 3))
    t.process(SequenceNumber(1))
    assert t.checkpointable() == sq(1)


def test_out_of_order_process_does_not_advance_past_gap(clock):
    # spec :100-123 — processing 2 and 3 with 1 unprocessed: nothing
    t = make(clock)
    t.track(sq(1, 2, 3))
    t.process(SequenceNumber(3))
    t.process(SequenceNumber(2))
    assert t.checkpointable() == []
    t.process(SequenceNumber(1))
    assert t.checkpointable() == sq(1, 2, 3)


def test_checkpoint_at_buffer_size_picks_highest_contiguous(clock):
    # spec :128-149 — track {1,2,3,4}, process {3,2,1} → checkpoint at 3
    t = make(clock, buffer=4)
    cp = RecordingCheckpointer()
    t.track(sq(1, 2, 3, 4))
    for n in (3, 2, 1):
        t.process(SequenceNumber(n))
    got = t.checkpoint_if_needed(cp)
    assert got == SequenceNumber(3)
    assert cp.calls == [SequenceNumber(3)]


def test_no_checkpoint_when_nothing_tracked(clock):
    # spec :151-159
    t = make(clock, buffer=1)
    cp = RecordingCheckpointer()
    assert t.checkpoint_if_needed(cp, force=True) is None
    assert cp.calls == []


def test_no_checkpoint_when_thresholds_unmet(clock):
    # spec :161-181
    t = make(clock, buffer=100, duration=60.0)
    cp = RecordingCheckpointer()
    t.track(sq(1, 2))
    t.process(SequenceNumber(1))
    assert t.checkpoint_if_needed(cp) is None
    assert cp.calls == []
    clock.advance(61.0)  # duration trigger now fires
    assert t.checkpoint_if_needed(cp) == SequenceNumber(1)


def test_checkpointed_prefix_dropped_from_tracking(clock):
    # spec :183-206
    t = make(clock, buffer=2)
    cp = RecordingCheckpointer()
    t.track(sq(1, 2, 3))
    t.process(SequenceNumber(1))
    t.process(SequenceNumber(2))
    assert t.checkpoint_if_needed(cp) == SequenceNumber(2)
    assert t.tracked == tuple(sq(3))
    # re-checkpoint with nothing new processed → nothing
    assert t.checkpoint_if_needed(cp, force=True) is None


def test_force_overrides_thresholds(clock):
    # spec :208-231
    t = make(clock, buffer=10_000, duration=60.0)
    cp = RecordingCheckpointer()
    t.track(sq(5))
    t.process(SequenceNumber(5))
    assert t.checkpoint_if_needed(cp) is None
    assert t.checkpoint_if_needed(cp, force=True) == SequenceNumber(5)


def test_force_with_gap_at_head_checkpoints_nothing(clock):
    # spec :233-250
    t = make(clock)
    cp = RecordingCheckpointer()
    t.track(sq(1, 2))
    t.process(SequenceNumber(2))
    assert t.checkpoint_if_needed(cp, force=True) is None
    assert cp.calls == []


def test_watch_completion_notifies_only_when_all_processed(clock):
    # spec :254-279
    t = make(clock)
    t.track(sq(1, 2))
    fired: list[BaseException | None] = []
    t.watch_completion(fired.append)
    assert fired == []
    t.process(SequenceNumber(1))
    assert fired == []
    t.process(SequenceNumber(2))
    assert fired == [None]
    # already-complete tracker fires immediately
    fired2: list[BaseException | None] = []
    t.watch_completion(fired2.append)
    assert fired2 == [None]


def test_shutdown_before_completion_fails_watcher(clock):
    # spec :281-303
    t = make(clock)
    t.track(sq(1))
    fired: list[BaseException | None] = []
    t.watch_completion(fired.append)
    t.shutdown()
    assert len(fired) == 1 and isinstance(fired[0], ShutdownException)
    with pytest.raises(TrackerInactiveError):
        t.track(sq(2))


def test_checkpointer_receives_exact_extended_sequence_number(clock):
    # spec :306-316 — (seqNum, subSeqNum) passed through exactly
    t = make(clock, buffer=1)
    cp = RecordingCheckpointer()
    t.track([SequenceNumber.of("49590338271490256608559692538361571095921575989136588898", 7)])
    t.process(SequenceNumber.of("49590338271490256608559692538361571095921575989136588898", 7))
    got = t.checkpoint_if_needed(cp)
    assert got == SequenceNumber(49590338271490256608559692538361571095921575989136588898, 7)
    assert cp.calls == [got]


def test_late_duplicate_acks_below_last_checkpoint_ignored(clock):
    # ShardCheckpointTrackerActor.scala:35-37 guard
    t = make(clock, buffer=1)
    cp = RecordingCheckpointer()
    t.track(sq(1))
    t.process(SequenceNumber(1))
    assert t.checkpoint_if_needed(cp) == SequenceNumber(1)
    t.process(SequenceNumber(1))  # re-ack after checkpoint: dropped
    t.track(sq(2, 3))
    assert t.checkpointable() == []  # the stale re-ack didn't leak into state


def test_sub_sequence_ordering(clock):
    # ExtendedSequenceNumber: compare seq then sub (Record.scala:22)
    t = make(clock)
    t.track([SequenceNumber(1, 0), SequenceNumber(1, 1), SequenceNumber(2, 0)])
    t.process(SequenceNumber(1, 0))
    assert t.checkpointable() == [SequenceNumber(1, 0)]
    t.process(SequenceNumber(1, 1))
    assert t.checkpointable() == [SequenceNumber(1, 0), SequenceNumber(1, 1)]


def test_failed_checkpointer_leaves_state_intact(clock):
    # actor replies Failure without mutating state
    t = make(clock, buffer=1)
    t.track(sq(1))
    t.process(SequenceNumber(1))

    def boom(seq: SequenceNumber) -> None:
        raise IOError("throttled")

    with pytest.raises(IOError):
        t.checkpoint_if_needed(boom)
    assert t.tracked == tuple(sq(1))
    cp = RecordingCheckpointer()
    assert t.checkpoint_if_needed(cp) == SequenceNumber(1)  # retry succeeds


# --- CheckpointTrackerActorSpec (registry) cases -----------------------------


def test_registry_track_requires_create():
    # spec :38-46, :48-56
    reg = CheckpointTracker("worker-1")
    with pytest.raises(TrackerInactiveError):
        reg.track("shard-9", sq(1))
    reg.start_shard("shard-9")
    assert reg.track("shard-9", sq(1)) == 1


def test_registry_process_after_shard_shutdown_is_benign():
    # spec :70-85 — ack for a lease that moved away is a no-op
    reg = CheckpointTracker("worker-1")
    reg.start_shard("shard-1")
    reg.track("shard-1", sq(1))
    reg.shutdown_shard("shard-1")
    reg.process("shard-1", SequenceNumber(1))  # must not raise


def test_registry_worker_shutdown_stops_all_children():
    # CheckpointTrackerActor.scala:72-79
    reg = CheckpointTracker("worker-1")
    a = reg.start_shard("shard-a")
    b = reg.start_shard("shard-b")
    reg.shutdown()
    assert not a.is_active and not b.is_active


def test_wait_for_completion_drain(clock):
    # CheckpointTracker.scala:89-93 façade: blocking drain with timeout
    t = make(clock)
    t.track(sq(1))
    with pytest.raises(TimeoutError):
        t.wait_for_completion(timeout_s=0.05)
    t.process(SequenceNumber(1))
    t.wait_for_completion(timeout_s=0.05)  # returns promptly
