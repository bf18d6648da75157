"""Frame-budget distributed batch sampler.

Capability parity with ``DsBatchSampler``
(``/root/reference/utils/training_utils.py:74-197``): size-bucketed dynamic
batching capped by frames/items per batch, sort-by-similar-size with a frame
grid quantization, per-epoch shuffling, round-robin rank assignment with
leftover padding so every replica gets equal batch counts, and batch counts
made a multiple of ``accumulate_grad_batches``.

Difference: sampling here is fully deterministic in (seed, epoch) — the
reference leaves its rng unseeded (training_utils.py:107), which makes
multi-rank assignments reproducible only by accident.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

from ..utils import batch_by_size


class DistributedBatchSampler:
    def __init__(
        self,
        dataset,
        max_batch_frames: int,
        max_batch_size: int,
        num_replicas: int = 1,
        rank: int = 0,
        required_batch_count_multiple: int = 1,
        sort_by_similar_size: bool = True,
        shuffle_sample: bool = True,
        shuffle_batch: bool = False,
        frame_count_grid: int = 6,
        seed: int = 0,
        drop_last: bool = False,
        disallow_empty_batch: bool = True,
        pad_batch_assignment: bool = True,
    ):
        if rank >= num_replicas or rank < 0:
            raise ValueError(f"Invalid rank {rank} for num_replicas {num_replicas}")
        self.dataset = dataset
        self.max_batch_frames = max_batch_frames
        self.max_batch_size = max_batch_size
        self.num_replicas = num_replicas
        self.rank = rank
        self.required_batch_count_multiple = required_batch_count_multiple
        self.sort_by_similar_size = sort_by_similar_size
        self.shuffle_sample = shuffle_sample
        self.shuffle_batch = shuffle_batch
        self.frame_count_grid = frame_count_grid
        self.seed = seed
        self.drop_last = drop_last
        self.disallow_empty_batch = disallow_empty_batch
        self.pad_batch_assignment = pad_batch_assignment
        self.epoch = 0
        self.batches: Optional[List[List[int]]] = None
        self._formed = None

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        self._form_batches()

    def _form_batches(self):
        if self._formed == (self.epoch, self.seed):
            return
        rng = np.random.default_rng(self.seed + self.epoch)
        if self.shuffle_sample:
            indices = rng.permutation(len(self.dataset))
            if self.sort_by_similar_size:
                grid = self.frame_count_grid
                sizes = (
                    np.round(np.asarray(self.dataset.sizes)[indices] / grid) * grid
                ).clip(grid, None)
                indices = indices[np.argsort(sizes, kind="mergesort")]
            indices = indices.tolist()
        else:
            indices = list(range(len(self.dataset)))

        batches = batch_by_size(
            indices, self.dataset.num_frames,
            max_batch_frames=self.max_batch_frames, max_batch_size=self.max_batch_size,
        )
        if len(batches) < self.num_replicas and self.disallow_empty_batch:
            raise RuntimeError("There is not enough batch to assign to each node.")

        floored_total = (len(batches) // self.num_replicas) * self.num_replicas
        if self.drop_last and len(batches) > floored_total:
            batches = batches[:floored_total]
            leftovers = []
        elif self.shuffle_batch:
            leftovers = (
                rng.permutation(len(batches) - floored_total) + floored_total
            ).tolist()
        else:
            leftovers = list(range(floored_total, len(batches)))

        matrix = np.arange(floored_total).reshape(-1, self.num_replicas).transpose()
        if self.shuffle_batch:
            matrix = rng.permuted(matrix, axis=0)

        # every rank's assignment is computed on every host (the whole thing
        # is deterministic in (seed, epoch)): a multi-process trainer needs
        # the OTHER ranks' step-aligned batches to agree on the global batch
        # shape without communication (see Trainer._global_shape_targets)
        all_assignments: List[List[int]] = []
        for rank in range(self.num_replicas):
            assignment = matrix[rank].tolist()
            floored = len(assignment)
            if rank < len(leftovers):
                assignment.append(leftovers[rank])
                floored += 1
            elif len(leftovers) > 0 and self.pad_batch_assignment:
                # duplicate one batch so every replica sees an equal batch
                # count (training only; the reference's val sampler leaves
                # ranks uneven, utils/training_utils.py:162-165 +
                # basics/base_task.py:359-369)
                if not assignment:
                    # an un-paddable empty rank is an error only if WE are
                    # that rank (pre-round-5 behavior: other ranks were
                    # never computed); its slot stays empty
                    if rank == self.rank:
                        raise RuntimeError("Cannot pad empty batch assignment.")
                    all_assignments.append([])
                    continue
                assignment.append(assignment[self.epoch % floored])

            if (
                self.required_batch_count_multiple > 1
                and len(assignment) % self.required_batch_count_multiple != 0
            ):
                ceiled = math.ceil(
                    len(assignment) / self.required_batch_count_multiple
                ) * self.required_batch_count_multiple
                for i in range(ceiled - len(assignment)):
                    assignment.append(
                        assignment[(i + self.epoch * self.required_batch_count_multiple) % floored]
                    )
            all_assignments.append(assignment)

        self._all_batches = batches
        self._assignments = all_assignments
        self.batches = [list(batches[i]) for i in all_assignments[self.rank]]
        self._formed = (self.epoch, self.seed)

    def batches_at_step(self, step_idx: int) -> List[List[int]]:
        """Item lists for EVERY rank at iteration ``step_idx`` (identical on
        all hosts — everything is deterministic in (seed, epoch)).  Used by
        the multi-process trainer to agree on the per-step global batch
        shape: every jit call on a multi-host mesh must be entered by every
        process with identical shapes."""
        self._form_batches()
        return [
            list(self._all_batches[a[step_idx]]) if step_idx < len(a) else []
            for a in self._assignments
        ]

    def __iter__(self):
        self._form_batches()
        return iter(self.batches)

    def __len__(self):
        self._form_batches()
        return len(self.batches)
