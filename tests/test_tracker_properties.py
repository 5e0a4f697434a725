"""Property-based invariants for the checkpoint tracker (hypothesis).

The example-based suite transcribes the reference's spec cases 1:1; these
properties assert the algorithm's laws over arbitrary interleavings of
track / process / checkpoint, which no finite example list can:

1. A committed checkpoint is always the highest CONTIGUOUS processed
   sequence number — never past a gap, never behind a fully-processed
   prefix that triggered a commit.
2. Checkpoints never regress, and late re-acks below the last checkpoint
   are ignored.
3. After force-checkpointing with everything processed, nothing remains
   tracked (drain invariant used at shard end / shutdown).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_stream_spark.checkpoint import (
    CheckpointConfig,
    SequenceNumber,
    ShardCheckpointTracker,
)


class Recorder:
    def __init__(self) -> None:
        self.commits: list[SequenceNumber] = []

    def __call__(self, seq: SequenceNumber) -> None:
        self.commits.append(seq)


# A scenario: how many records to track, which (by index) get processed, in
# what order, and where force-checkpoints are interleaved.
scenarios = st.integers(min_value=1, max_value=30).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.permutations(range(n)),
        st.integers(min_value=0, max_value=n),  # how many of the permutation to process
        st.sets(st.integers(min_value=0, max_value=n), max_size=5),  # checkpoint points
    )
)


@settings(max_examples=300, deadline=None)
@given(scenarios)
def test_checkpoint_is_highest_contiguous_and_monotone(scenario):
    n, order, n_process, checkpoint_after = scenario
    seqs = [SequenceNumber(i) for i in range(n)]
    tracker = ShardCheckpointTracker("shard-p", CheckpointConfig(max_buffer_size=10**9))
    rec = Recorder()
    tracker.track(seqs)

    processed: set[int] = set()
    for step, idx in enumerate(order[:n_process]):
        tracker.process(seqs[idx])
        processed.add(idx)
        if step in checkpoint_after:
            tracker.checkpoint_if_needed(rec, force=True)
            _assert_commit_is_contiguous_prefix(rec, processed, n)
    tracker.checkpoint_if_needed(rec, force=True)
    _assert_commit_is_contiguous_prefix(rec, processed, n)

    # monotone: every commit strictly above the previous one
    assert rec.commits == sorted(set(rec.commits))


def _assert_commit_is_contiguous_prefix(rec, processed, n):
    expected = -1
    while expected + 1 < n and (expected + 1) in processed:
        expected += 1
    if rec.commits:
        assert rec.commits[-1] == SequenceNumber(expected)
    else:
        assert expected == -1  # nothing contiguous yet -> no commit allowed


@settings(max_examples=200, deadline=None)
@given(st.permutations(range(12)))
def test_full_processing_any_order_drains(order):
    seqs = [SequenceNumber(i) for i in range(12)]
    tracker = ShardCheckpointTracker("shard-d", CheckpointConfig(max_buffer_size=10**9))
    rec = Recorder()
    tracker.track(seqs)
    for idx in order:
        tracker.process(seqs[idx])
    tracker.checkpoint_if_needed(rec, force=True)
    assert rec.commits[-1] == SequenceNumber(11)
    assert tracker.tracked == ()  # drained
    # late duplicate ack below the checkpoint is benign and ignored
    tracker.process(seqs[0])
    tracker.checkpoint_if_needed(rec, force=True)
    assert rec.commits[-1] == SequenceNumber(11)
