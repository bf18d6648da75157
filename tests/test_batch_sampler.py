"""Unit tests for DistributedBatchSampler (parity target: the reference's
DsBatchSampler, utils/training_utils.py:74-197) and the shared offline
alignment helpers (parity target: get_mel2ph_torch,
utils/binarizer_utils.py:28-39)."""

import numpy as np
import pytest

from xiaoicesing_io_tpu.data.sampler import DistributedBatchSampler
from xiaoicesing_io_tpu.preprocessing.align import (
    dur_to_mel2x,
    frames_from_sec,
    sec_to_mel2x,
)


class _FakeDataset:
    def __init__(self, sizes):
        self.sizes = list(sizes)

    def __len__(self):
        return len(self.sizes)

    def num_frames(self, idx):
        return self.sizes[idx]


def _make(sizes, **kw):
    kw.setdefault("max_batch_frames", 200)
    kw.setdefault("max_batch_size", 4)
    epoch = kw.pop("epoch", 0)
    s = DistributedBatchSampler(_FakeDataset(sizes), **kw)
    s.set_epoch(epoch)
    return s


def test_ranks_partition_and_pad_equal_counts():
    sizes = [50, 60, 70, 80, 90, 40, 55, 65, 75, 85, 45]
    n = 4
    per_rank = [
        _make(sizes, num_replicas=n, rank=r, seed=7).batches for r in range(n)
    ]
    counts = [len(b) for b in per_rank]
    # pad_batch_assignment equalizes the batch count across replicas
    assert len(set(counts)) == 1
    all_items = [i for b in per_rank for batch in b for i in batch]
    # every item appears (padding may duplicate whole batches, never drop)
    assert set(all_items) == set(range(len(sizes)))


def test_deterministic_per_epoch_and_reshuffled_across_epochs():
    sizes = list(np.random.default_rng(0).integers(30, 100, size=40))
    a = _make(sizes, num_replicas=2, rank=0, seed=3, epoch=1).batches
    b = _make(sizes, num_replicas=2, rank=0, seed=3, epoch=1).batches
    c = _make(sizes, num_replicas=2, rank=0, seed=3, epoch=2).batches
    assert a == b
    assert a != c


def test_frame_and_item_budgets():
    sizes = list(np.random.default_rng(1).integers(10, 190, size=64))
    s = _make(sizes, max_batch_frames=200, max_batch_size=3)
    for batch in s.batches:
        assert len(batch) <= 3
        assert max(sizes[i] for i in batch) * len(batch) <= 200


def test_pad_empty_assignment_raises_cleanly():
    # 1 batch, 4 replicas: floored count is 0; ranks beyond the leftover must
    # fail with the reference's explicit error (training_utils.py:163-165),
    # not a ZeroDivisionError
    with pytest.raises(RuntimeError, match="pad empty batch assignment"):
        _make(
            [50, 60], num_replicas=4, rank=2, seed=0,
            disallow_empty_batch=False,
        )


def test_multiple_padding_after_leftover_with_zero_floored():
    # 1 batch, 4 replicas, rank 0 receives the leftover; padding to a batch
    # count multiple must index the (now length-1) assignment, mirroring the
    # reference's floored_batch_count += 1 (training_utils.py:161)
    s = _make(
        [50, 60], num_replicas=4, rank=0, seed=0,
        disallow_empty_batch=False, required_batch_count_multiple=4,
    )
    assert len(s.batches) == 4
    assert all(b == s.batches[0] for b in s.batches)


def test_disallow_empty_batch():
    with pytest.raises(RuntimeError, match="not enough batch"):
        _make([50], num_replicas=2, rank=0)


# -- alignment helpers ------------------------------------------------------


def test_dur_to_mel2x_edge_fills_past_total_duration():
    # a wav longer than its transcription: trailing frames must take the LAST
    # phoneme's index, not padding 0 (ref: binarizer_utils.py:34-37)
    m = dur_to_mel2x([2, 3, 1], length=10)
    np.testing.assert_array_equal(m, [1, 1, 2, 2, 2, 3, 3, 3, 3, 3])


def test_dur_to_mel2x_truncates():
    m = dur_to_mel2x([2, 3, 1], length=4)
    np.testing.assert_array_equal(m, [1, 1, 2, 2])


def test_frames_from_sec_cumsum_round_diff():
    ts = 512 / 44100
    dur = np.array([0.1, 0.25, 0.25, 0.1])
    f = frames_from_sec(dur, ts)
    acc = np.round(np.cumsum(dur) / ts + 0.5).astype(np.int64)
    assert f.sum() == acc[-1]
    assert (f >= 0).all()


def test_sec_to_mel2x_matches_composition():
    ts = 512 / 44100
    dur = np.array([0.12, 0.2, 0.2, 0.18])
    np.testing.assert_array_equal(
        sec_to_mel2x(dur, 80, ts), dur_to_mel2x(frames_from_sec(dur, ts), 80)
    )
