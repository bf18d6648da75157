"""Binarized datasets + batch collators.

Capability parity with ``/root/reference/basics/base_dataset.py`` and the
dataset/collator classes in ``training/acoustic_task.py:39-63`` /
``training/variance_task.py:30-68``.  TPU-first difference: collators pad to
shape buckets (frames to multiples of ``frame_bucket``, tokens/notes to
multiples of ``token_bucket``) so jitted train steps compile once per bucket
instead of once per batch.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..utils import collate_nd
from .indexed_dataset import IndexedDataset

FRAME_BUCKET = 128
TOKEN_BUCKET = 32


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


#: auto-preload limit: binarized sets smaller than this are held in RAM so
#: the collate thread never re-reads HDF5 (per-item reads are ~70% of a warm
#: collate's cost on this host — docs/PerformanceNotes.md round 3)
PRELOAD_AUTO_MAX_BYTES = 512 * 1024 * 1024


class BaseDataset:
    def __init__(self, data_dir, prefix: str, size_key: str = "lengths",
                 preload: bool | None = None):
        """``preload``: True/False force; None = auto (preload iff the
        ``.data`` file is under ``PRELOAD_AUTO_MAX_BYTES``).  The reference
        exposes the same option (``/root/reference/basics/base_dataset.py:26``)
        but never enables it; here a starved feed thread directly idles the
        TPU, so small sets default to resident."""
        self.data_dir = Path(data_dir)
        self.prefix = prefix
        with open(self.data_dir / f"{prefix}.meta", "rb") as f:
            self.metadata = pickle.load(f)
        self.sizes = np.asarray(self.metadata[size_key])
        self._ds = IndexedDataset(self.data_dir, prefix)
        self._preloaded = None
        if preload is None:
            try:
                preload = (self.data_dir / f"{prefix}.data").stat().st_size \
                    < PRELOAD_AUTO_MAX_BYTES
            except OSError:
                preload = False
        if preload:
            self._preloaded = [self._ds[i] for i in range(len(self._ds))]

    def __len__(self):
        return len(self.sizes)

    def num_frames(self, index: int) -> int:
        return int(self.sizes[index])

    def attr_len(self, key: str, index: int) -> int:
        """Per-item length of attribute ``key`` from the metadata sidecar —
        no HDF5 read.  Lets a multi-process trainer compute OTHER ranks'
        batch shapes without touching their data."""
        return int(self.metadata[key][index])

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        if self._preloaded is not None:
            return self._preloaded[index]
        return self._ds[index]


class AcousticDataset(BaseDataset):
    def __init__(self, data_dir, prefix, cfg, preload=None):
        if preload is None:
            preload = cfg.get("dataset_preload", None)
        super().__init__(data_dir, prefix, size_key=cfg.get("dataset_size_key", "lengths"),
                         preload=preload)
        self.cfg = cfg
        self.required_variances = [
            v for v in ("energy", "breathiness", "voicing", "tension")
            if cfg.get(f"use_{v}_embed", False)
        ]

    def collate(self, indices: List[int], pad_to_bucket: bool = True,
                pad_batch_to: int = 0, pad_frames_to: int = 0,
                pad_tokens_to: int = 0) -> Dict[str, np.ndarray]:
        """``pad_frames_to``/``pad_tokens_to`` force MINIMUM padded lengths —
        the multi-process trainer passes the cross-rank maxima so every host
        enters the jitted step with identical global shapes."""
        samples = [self[i] for i in indices]
        T_f = max(max(s["mel"].shape[0] for s in samples), pad_frames_to)
        T_ph = max(max(len(s["tokens"]) for s in samples), pad_tokens_to)
        if pad_to_bucket:
            T_f = _round_up(T_f, FRAME_BUCKET)
            T_ph = _round_up(T_ph, TOKEN_BUCKET)
        # rows > len(samples) appends all-zero padding rows: tokens == 0 (pad
        # id) and mel2ph == 0, so they carry no loss under the non-padding
        # masks and no frames in the throughput metric
        n = max(len(samples), pad_batch_to)
        batch = {
            "tokens": collate_nd([s["tokens"] for s in samples], max_len=T_ph,
                                 dtype=np.int32, rows=n),
            "mel": collate_nd([s["mel"] for s in samples], max_len=T_f,
                              dtype=np.float32, rows=n),
            "mel2ph": collate_nd([s["mel2ph"] for s in samples], max_len=T_f,
                                 dtype=np.int32, rows=n),
            "f0": collate_nd([s["f0"] for s in samples], max_len=T_f,
                             dtype=np.float32, rows=n),
        }
        for v in self.required_variances:
            batch[v] = collate_nd([s[v] for s in samples], max_len=T_f,
                                  dtype=np.float32, rows=n)
        if self.cfg.get("use_key_shift_embed", False):
            ks = np.zeros((n, T_f), np.float32)
            ks[: len(samples)] = np.asarray(
                [s["key_shift"] for s in samples], np.float32
            )[:, None]
            batch["key_shift"] = ks
        if self.cfg.get("use_speed_embed", False):
            sp = np.zeros((n, T_f), np.float32)
            sp[: len(samples)] = np.asarray(
                [s["speed"] for s in samples], np.float32
            )[:, None]
            batch["speed"] = sp
        if self.cfg.get("use_spk_id", False):
            ids = np.zeros(n, np.int32)
            ids[: len(samples)] = [s["spk_id"] for s in samples]
            batch["spk_ids"] = ids
        return batch


class VarianceDataset(BaseDataset):
    def __init__(self, data_dir, prefix, cfg, preload=None):
        if preload is None:
            preload = cfg.get("dataset_preload", None)
        super().__init__(data_dir, prefix, size_key=cfg.get("dataset_size_key", "lengths"),
                         preload=preload)
        self.cfg = cfg
        self.predict_variances = [
            v for v in ("energy", "breathiness", "voicing", "tension")
            if cfg.get(f"predict_{v}", False)
        ]

    def collate(self, indices: List[int], pad_to_bucket: bool = True,
                pad_batch_to: int = 0, pad_frames_to: int = 0,
                pad_tokens_to: int = 0, pad_notes_to: int = 0) -> Dict[str, np.ndarray]:
        """``pad_*_to`` force MINIMUM padded lengths — the multi-process
        trainer passes cross-rank maxima for cross-host shape agreement."""
        cfg = self.cfg
        samples = [self[i] for i in indices]
        T_ph = max(max(len(s["tokens"]) for s in samples), pad_tokens_to)
        if pad_to_bucket:
            T_ph = _round_up(T_ph, TOKEN_BUCKET)
        n = max(len(samples), pad_batch_to)  # extra rows = all-zero padding
        batch = {
            "tokens": collate_nd([s["tokens"] for s in samples], max_len=T_ph,
                                 dtype=np.int32, rows=n),
            "ph_dur": collate_nd([s["ph_dur"] for s in samples], max_len=T_ph,
                                 dtype=np.int32, rows=n),
        }
        if cfg.get("predict_dur", True):
            batch["ph2word"] = collate_nd(
                [s["ph2word"] for s in samples], max_len=T_ph,
                dtype=np.int32, rows=n,
            )
            batch["midi"] = collate_nd([s["midi"] for s in samples], max_len=T_ph,
                                       dtype=np.int32, rows=n)
        if "mel2ph" in samples[0]:
            T_f = max(max(s["mel2ph"].shape[0] for s in samples), pad_frames_to)
            if pad_to_bucket:
                T_f = _round_up(T_f, FRAME_BUCKET)
            batch["mel2ph"] = collate_nd(
                [s["mel2ph"] for s in samples], max_len=T_f,
                dtype=np.int32, rows=n,
            )
            batch["pitch"] = collate_nd([s["pitch"] for s in samples], max_len=T_f,
                                        dtype=np.float32, rows=n)
            batch["uv"] = collate_nd([s["uv"] for s in samples], max_len=T_f,
                                     dtype=bool, rows=n)
        if cfg.get("predict_pitch", True):
            T_n = max(max(s["note_midi"].shape[0] for s in samples), pad_notes_to)
            if pad_to_bucket:
                T_n = _round_up(T_n, TOKEN_BUCKET)
            batch["note_midi"] = collate_nd(
                [s["note_midi"] for s in samples], pad_value=-1.0, max_len=T_n,
                dtype=np.float32, rows=n,
            )
            batch["note_rest"] = collate_nd(
                [s["note_rest"] for s in samples], pad_value=True, max_len=T_n,
                dtype=bool, rows=n,
            )
            batch["note_dur"] = collate_nd(
                [s["note_dur"] for s in samples], max_len=T_n,
                dtype=np.int32, rows=n,
            )
            if cfg.get("use_glide_embed", False):
                batch["note_glide"] = collate_nd(
                    [s["note_glide"] for s in samples], max_len=T_n,
                    dtype=np.int32, rows=n,
                )
            batch["mel2note"] = collate_nd(
                [s["mel2note"] for s in samples], max_len=batch["mel2ph"].shape[1],
                dtype=np.int32, rows=n,
            )
            batch["base_pitch"] = collate_nd(
                [s["base_pitch"] for s in samples], max_len=batch["mel2ph"].shape[1],
                dtype=np.float32, rows=n,
            )
        for v in self.predict_variances:
            batch[v] = collate_nd(
                [s[v] for s in samples], max_len=batch["mel2ph"].shape[1],
                dtype=np.float32, rows=n,
            )
        if cfg.get("use_spk_id", False):
            ids = np.zeros(n, np.int32)
            ids[: len(samples)] = [s["spk_id"] for s in samples]
            batch["spk_ids"] = ids
        return batch
